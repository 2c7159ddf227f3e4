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


def test_y4m_roundtrip_pure():
    """Y4M writer/reader round-trip: header fields, frame count, planes;
    Cmono decodes with neutral chroma."""
    import numpy as np

    from featuregenerator_spark.operators import multimodal as mm

    frames = np.random.default_rng(7).integers(
        0, 256, size=(5, 6, 8, 3), dtype=np.uint8
    )
    buf = mm._y4m_encode(frames, fps="30:1")
    assert buf.startswith(b"YUV4MPEG2 W8 H6 F30:1 Ip A1:1 C444\n")
    back, fps = mm._y4m_decode(buf)
    assert fps == "30:1"
    assert (back == frames).all()
    mono = (
        b"YUV4MPEG2 W4 H2 F25:1 Cmono\n"
        + b"FRAME\n" + bytes(range(8))
        + b"FRAME\n" + bytes(range(8, 16))
    )
    mf, _ = mm._y4m_decode(mono)
    assert mf.shape == (2, 2, 4, 3)
    assert mf[1, 0, 0, 0] == 8 and (mf[:, :, :, 1:] == 128).all()


def test_video_decode_and_frame_sample(spark):
    """REAL video codec path end-to-end: synth -> decode features, and
    frame-sampling keeps exactly frames 0, n, 2n with re-encoded output
    that decodes again (round 3 closed the last multimodal stub)."""
    from featuregenerator_spark.operators import multimodal as mm

    ids = spark.range(6).select(F.col("id").alias("asset_id"))
    vids = mm.synth_y4m_assets(ids)
    feats = {r["asset_id"]: r for r in mm.decode_y4m_assets(vids).collect()}
    for i in range(6):
        r = feats[i]
        n = 4 + i % 4
        assert (r["width"], r["height"], r["n_frames"]) == (
            8 + 2 * (i % 4), 6 + 2 * (i % 3), n
        )
        assert r["mean_y"] == pytest.approx(i % 200 + (n - 1) / 2.0)
    sampled = {
        r["asset_id"]: r
        for r in mm.decode_y4m_assets(
            mm.sample_video_frames(vids, every_n=2)
        ).collect()
    }
    for i in range(6):
        n = 4 + i % 4
        m = (n + 1) // 2
        assert sampled[i]["n_frames"] == m
        assert sampled[i]["mean_y"] == pytest.approx(i % 200 + (m - 1))
    with pytest.raises(ValueError):
        mm.sample_video_frames(vids, every_n=0)


def _write_batches(transcripts, path, col="turn_idx", split=5):
    """Two parquet 'arrival batches' so state must carry across triggers."""
    transcripts.filter(F.col(col) < split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/b0")
    transcripts.filter(F.col(col) >= split).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/b1")


def test_stateful_snapshot_parity_and_resume(spark, transcripts, tmp_path):
    """applyInPandasWithState running snapshot == batch window features,
    and the query resumes from its checkpoint (streaming north_rule
    resumability). File sink + checkpoint = the production shape."""
    from pyspark.sql import Window

    from featuregenerator_spark.streaming import stream_features as sf

    src = str(tmp_path / "src")
    _write_batches(transcripts, src)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def start_query():
        stream = (
            spark.readStream.schema(sf.TRANSCRIPT_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = (
            sf.running_snapshot_features(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    start_query()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["n_prior_turns"], r["gap_seconds"])
        for r in spark.read.parquet(sink).collect()
    }

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    want_df = transcripts.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).cast("long").alias("n_prior_turns"),
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_seconds"),
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["n_prior_turns"], r["gap_seconds"])
        for r in want_df.collect()
    }
    assert got == want

    # resume from checkpoint: a third arrival batch picks up prior state
    extra = transcripts.groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx"), F.max("ts").alias("mts")
    ).select(
        "conv_id",
        (F.col("mx") + 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("resumed turn").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.col("mts").cast("double") + 60).alias("ts"),
    )
    extra.coalesce(1).write.mode("overwrite").parquet(src + "/b2")
    start_query()
    all_rows = spark.read.parquet(sink).collect()
    per_conv_max = {
        r["conv_id"]: r["mx"] for r in transcripts.groupBy("conv_id")
        .agg(F.max("turn_idx").alias("mx")).collect()
    }
    # exactly one new row per conversation was appended (no reprocessing)
    assert len(all_rows) == len(want) + len(per_conv_max)
    for r in all_rows:
        if (r["conv_id"], r["turn_idx"]) in want:
            continue
        # the resumed turn continued from checkpointed state (prior count
        # = all turns seen before the restart; gap measured vs state ts)
        assert r["turn_idx"] == per_conv_max[r["conv_id"]] + 1
        assert r["n_prior_turns"] == per_conv_max[r["conv_id"]] + 1
        assert abs(r["gap_seconds"] - 60.0) < 1e-6


def test_wav_decode_real_codec(spark):
    """decode_wav_assets parses genuine RIFF/WAVE bytes: header fields and
    sample RMS round-trip exactly for a known square wave, including a
    hand-built stereo payload."""
    import io
    import wave

    import numpy as np
    from pyspark.sql import functions as F

    from featuregenerator_spark.operators.multimodal import (
        decode_wav_assets,
        synth_wav_assets,
    )

    ids = spark.range(10).select(F.col("id").alias("asset_id"))
    out = {r["asset_id"]: r for r in decode_wav_assets(synth_wav_assets(ids)).collect()}
    for i in range(10):
        r = out[i]
        assert (r["n_channels"], r["sample_width"], r["sample_rate"]) == (1, 2, 8000)
        assert r["n_frames"] == 800 + (i % 5) * 80
        assert r["duration_s"] == r["n_frames"] / 8000.0
        assert r["rms"] == float(1000 + (i % 7) * 100)

    # stereo, different rate: constant amplitude 3 -> rms 3.0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(np.full(2 * 50, 3, dtype=np.int16).tobytes())
    df = spark.createDataFrame([(99, "audio", bytearray(buf.getvalue()))],
                               "asset_id long, kind string, payload binary")
    r = decode_wav_assets(df).collect()[0]
    assert (r["n_channels"], r["sample_rate"], r["n_frames"]) == (2, 44100, 50)
    assert r["rms"] == 3.0


def test_audio_spectral_closed_forms(spark):
    """audio_spectral_features recovers the square tone's closed forms —
    rms == amp, zcr == n/p - 1, dominant FFT bin == n/(2p) — across every
    (id % 5, id % 7) class."""
    from pyspark.sql import functions as F

    from featuregenerator_spark.operators.multimodal import (
        audio_spectral_features,
        synth_tone_wav_assets,
    )

    ids = spark.range(35).select(F.col("id").alias("asset_id"))
    out = {
        r["asset_id"]: r
        for r in audio_spectral_features(synth_tone_wav_assets(ids)).collect()
    }
    for i in range(35):
        r = out[i]
        p = (2, 4, 5, 8, 10)[i % 5]
        assert (r["sample_rate"], r["n_frames"]) == (8000, 1600)
        assert r["rms"] == float(1000 + (i % 7) * 100)
        assert r["zcr"] == 1600 // p - 1
        assert r["dominant_bin"] == 1600 // (2 * p)
        assert r["dominant_hz"] == r["dominant_bin"] * 8000.0 / 1600


def test_audio_spectral_mixed_frame_counts(spark):
    """The batched-FFT path groups payloads by frame count inside each
    Arrow batch; heterogeneous lengths in ONE batch (and a sine payload,
    not just squares) must come back in input order with per-length
    correctness."""
    import io
    import wave

    import numpy as np

    from featuregenerator_spark.operators.multimodal import (
        audio_spectral_features,
    )

    def wav(samples, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.astype(np.int16).tobytes())
        return bytearray(buf.getvalue())

    # 3 lengths interleaved: 512-sample sine at bin 16, 1024-sample square
    # (half-period 8 -> bin 64), 256-sample constant (dominant bin != DC is
    # the largest non-DC component; zcr 0)
    sine = np.round(2000 * np.sin(2 * np.pi * 16 * np.arange(512) / 512))
    sq = np.tile(np.r_[np.full(8, 900), np.full(8, -900)], 64)
    const = np.full(256, 700)
    rows = [
        (0, "audio", wav(sine)),
        (1, "audio", wav(sq)),
        (2, "audio", wav(const)),
        (3, "audio", wav(sq)),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary"
    ).coalesce(1)
    out = {r["asset_id"]: r for r in audio_spectral_features(df).collect()}
    assert out[0]["n_frames"] == 512 and out[0]["dominant_bin"] == 16
    assert abs(out[0]["rms"] - 2000 / np.sqrt(2)) < 1.0
    for i in (1, 3):
        assert out[i]["n_frames"] == 1024
        assert out[i]["dominant_bin"] == 1024 // 16
        assert out[i]["zcr"] == 1024 // 8 - 1
        assert out[i]["rms"] == 900.0
    assert out[2]["n_frames"] == 256 and out[2]["zcr"] == 0
    assert out[2]["rms"] == 700.0


def test_bmp_roundtrip_and_padding():
    """Pure-numpy BMP writer/reader: encode->decode identity for widths
    that do and don't need 4-byte row padding, bottom-up storage."""
    import numpy as np

    from featuregenerator_spark.operators.multimodal import (
        _bmp_decode,
        _bmp_encode,
    )

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 16, 17, 23):
        for h in (1, 5, 12):
            rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            buf = _bmp_encode(rgb)
            # header invariants: magic, 54-byte pixel offset, 24bpp
            assert buf[:2] == b"BM" and buf[10] == 54
            assert len(buf) == 54 + ((w * 3 + 3) & ~3) * h
            np.testing.assert_array_equal(_bmp_decode(buf), rgb)


def test_resize_images_nearest_neighbor(spark):
    """resize_images is a REAL decode->resample->re-encode path: output
    payloads are valid BMPs of the target size whose pixels equal the
    numpy nearest-neighbor reference."""
    import numpy as np

    from featuregenerator_spark.operators.multimodal import (
        _bmp_decode,
        decode_bmp_assets,
        resize_images,
        synth_bmp_assets,
    )

    ids = spark.range(12).selectExpr("id AS asset_id")
    assets = synth_bmp_assets(ids)
    originals = {
        r["asset_id"]: bytes(r["payload"]) for r in assets.collect()
    }
    resized = {
        r["asset_id"]: bytes(r["payload"])
        for r in resize_images(assets, 8, 6).collect()
    }
    for aid, buf in resized.items():
        src = _bmp_decode(originals[aid])
        h, w, _ = src.shape
        ys = (np.arange(6) * h) // 6
        xs = (np.arange(8) * w) // 8
        want = src[np.ix_(ys, xs)]
        np.testing.assert_array_equal(_bmp_decode(buf), want)

    # and the decoded features of resized assets report the new size
    feats = decode_bmp_assets(resize_images(assets, 8, 6)).collect()
    assert all(r["width"] == 8 and r["height"] == 6 for r in feats)


def test_streaming_session_gap_boundary_semantics(spark, tmp_path):
    """The load-bearing boundary: an event exactly `gap` after the
    previous one MERGES into the session in BOTH engines — Spark's
    session_window merges when new_start <= current_end, and the batch
    rule starts a new session only when gap > threshold. Events 1ms past
    the gap split. Pinned with crafted timestamps either side of 1800s."""
    import datetime as dt

    from featuregenerator_spark.streaming import stream_features as sf
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: gaps of exactly 1800s -> ONE session of 3
        (1, base, 10, "click", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=1800), 10, "click", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=3600), 10, "click", 1.0, "{}"),
        # user 2: gap of 1800.001s -> TWO sessions
        (4, base, 20, "click", 1.0, "{}"),
        (5, base + dt.timedelta(seconds=1800, milliseconds=1), 20, "click",
         1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, sf.EVENTS_DDL)
    path = str(tmp_path / "evb")
    df.write.mode("overwrite").parquet(path)
    out = sf.event_session_aggregates(
        sf.read_event_stream(spark, path), gap="30 minutes"
    )
    sf.run_stream_to_memory(out, "sess_boundary", output_mode="complete")
    got = {
        (r.user_id, r.min_event_id): (r.n_events, r.max_event_id)
        for r in spark.table("sess_boundary").collect()
    }
    assert got == {(10, 1): (3, 3), (20, 4): (1, 4), (20, 5): (1, 5)}
    # and the batch sessionize agrees: same session labeling
    from featuregenerator_spark.plans import temporal

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    idx = F.sum(
        F.when(g.isNull() | (g > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    batch = df.select("user_id", "event_id", idx.alias("session_idx")).collect()
    labels = {r.event_id: r.session_idx for r in batch}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}


def test_streaming_decayed_count_multibatch_parity(spark, transcripts, tmp_path):
    """Streaming EWMA state must carry across micro-batches: run
    running_decayed_count over two arrival batches (maxFilesPerTrigger=1)
    and match the batch with_decayed_sum at every (conv_id, turn_idx) —
    including rows whose prior history arrived in an earlier trigger."""
    import pytest as pt

    from featuregenerator_spark.plans import temporal
    from featuregenerator_spark.streaming import stream_features as sf

    src = str(tmp_path / "src")
    _write_batches(transcripts, src)

    stream = (
        spark.readStream.schema(sf.TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    # transcripts key by conv_id; reuse the event-shaped operator by
    # renaming (the operator groups by user_id and emits event_id)
    renamed = stream.withColumnRenamed("conv_id", "user_id").withColumn(
        "event_id",
        (F.pmod(F.xxhash64("user_id"), F.lit(10**12)) * 1000
         + F.col("turn_idx")).cast("long"),
    )
    out = sf.running_decayed_count(renamed, half_life_seconds=1800.0)
    name = "decay_mb_parity"
    spark.catalog.dropTempView(name)
    sf.run_stream_to_memory(out, name)
    got = {
        r["event_id"]: r["decayed_count"] for r in spark.table(name).collect()
    }

    base = temporal.with_ts_seconds(transcripts)
    want_df = temporal.with_decayed_sum(base, 1800.0, "dc").select(
        (F.pmod(F.xxhash64("conv_id"), F.lit(10**12)) * 1000
         + F.col("turn_idx")).cast("long").alias("event_id"),
        "dc",
    )
    want = {r["event_id"]: r["dc"] for r in want_df.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pt.approx(want[k], abs=1e-9), k
