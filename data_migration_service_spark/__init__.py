"""data_migration_service_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
Spring Batch migration service (topEngineerRay/data-migration-service):

- chunked ordered read->transform->write  ->  Structured Streaming micro-batch
  MERGE into a snapshot-committed lake table, keyed (repo, path), LWW by lsn
- row-count / md5 verification              ->  distributed sha256 hash-diff join
- cleanup / targeted re-migration           ->  snapshot DELETE / keyed re-replay
- job state, locking, restart bookkeeping   ->  epoch-tagged idempotent snapshot
                                                commits + per-partition lineage

Everything is DataFrame/SQL-first: Catalyst owns optimization, Python never
touches rows one at a time (pandas/Arrow UDFs only where a built-in is missing).
"""

__version__ = "0.1.0"

from data_migration_service_spark.config import EngineConfig  # noqa: F401
from data_migration_service_spark.session import get_spark  # noqa: F401
