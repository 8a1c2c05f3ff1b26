"""Multimodal plumbing: the decode-free sampling plan (operators/multimodal.py).
The mapInPandas feature path is covered by the oracle-checked multimodal_features
query; this file pins the frame-sampling arithmetic."""


def test_frame_sample_plan_properties(spark):
    """Sampling-plan invariants: frame count honors target and spacing,
    timestamps are strictly inside [0, duration), monotone, midpoint-
    spaced; zero/unknown duration yields exactly one frame at 0."""
    from data_migration_service_spark.operators.multimodal import (
        frame_sample_plan,
        gen_media_fixture,
    )

    media = gen_media_fixture(spark, n=64)
    plan = frame_sample_plan(media, target_frames=8, min_spacing_ms=100)
    rows = plan.orderBy("media_id", "frame_idx").collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert by_media  # videos exist in the fixture
    for mid, frames in by_media.items():
        dur = frames[0]["duration_ms"]
        n = frames[0]["n_frames"]
        assert n == (min(8, max(1, dur // 100)) if dur > 0 else 1)
        assert [f["frame_idx"] for f in frames] == list(range(n))
        ts = [f["ts_ms"] for f in frames]
        assert ts == sorted(ts)
        if dur > 0:
            assert all(0 <= t < dur for t in ts)
            assert ts == [(2 * i + 1) * dur // (2 * n) for i in range(n)]
        else:
            assert ts == [0]
    # only videos are planned
    assert set(by_media) == {r["media_id"] for r in media.where(
        "kind = 'video'").collect()}
