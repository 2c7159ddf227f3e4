"""Streaming parity smoke + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F


def test_stream_rolling_counts_parity(spark, transcripts, tmp_path):
    from featuregenerator_spark.streaming import stream_features as sf

    path = str(tmp_path / "tr")
    transcripts.write.mode("overwrite").parquet(path)
    stream = sf.read_transcript_stream(spark, path)
    agg = sf.rolling_turn_counts(stream, window="1 hour", slide="1 hour")
    sf.run_stream_to_memory(agg, "stream_counts")
    got = spark.sql("SELECT * FROM stream_counts")
    # batch equivalent: tumbling window groupBy
    want = (
        transcripts.groupBy(F.window("ts", "1 hour", "1 hour"), "conv_id")
        .agg(F.count(F.lit(1)).alias("turns_in_window"))
        .select("conv_id", "window", "turns_in_window")
    )
    g = got.select("conv_id", "window", "turns_in_window")
    # streamed rows must be exactly right...
    assert g.exceptAll(want).count() == 0
    # ...and the only batch rows the stream may lack are windows not yet
    # finalized by the watermark at end-of-stream (append-mode semantics).
    max_ts = transcripts.agg(F.max("ts")).collect()[0][0]
    missing = want.exceptAll(g)
    not_final = missing.filter(
        F.col("window.end") <= F.lit(max_ts) - F.expr("INTERVAL 30 MINUTES")
    )
    assert not_final.count() == 0


def test_stream_sessions_smoke(spark, transcripts, tmp_path):
    from featuregenerator_spark.streaming import stream_features as sf

    path = str(tmp_path / "tr2")
    transcripts.write.mode("overwrite").parquet(path)
    stream = sf.read_transcript_stream(spark, path)
    sess = sf.session_aggregates(stream, gap="30 minutes")
    sf.run_stream_to_memory(sess, "stream_sessions")
    got = spark.sql("SELECT * FROM stream_sessions")
    assert got.count() > 0
    assert got.filter(F.col("session_turns") <= 0).count() == 0


def test_multimodal_plumbing(spark):
    from featuregenerator_spark.operators import multimodal as mm

    assets = mm.synth_assets(spark, n=50)
    feats = mm.decode_assets(assets, batch_rows=7)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
        assert len(r["payload_hash"]) == 32
    # determinism
    again = {r["asset_id"]: r["feature"] for r in mm.decode_assets(assets).collect()}
    for r in rows:
        assert again[r["asset_id"]] == r["feature"]


def test_multimodal_stubs_raise(spark):
    from featuregenerator_spark.operators import multimodal as mm

    assets = mm.synth_assets(spark, n=1)
    with pytest.raises(NotImplementedError):
        mm.resize_images(assets, 32, 32)
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(assets, 10)
