from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tcr_kcore_spark.functions.multimodal import (
    decode_and_featurize,
    frame_sample_plan,
    synth_media_table,
)
from tcr_kcore_spark.streaming.events import (
    hourly_counts_batch,
    run_stream_once,
)


def test_multimodal_decode_plumbing(spark):
    media = synth_media_table(spark, n=30)
    feats = decode_and_featurize(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r["sample_id"]: r for r in rows}
    assert all(len(r["feat"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: same input → same checksum
    again = {r["sample_id"]: r["checksum"] for r in decode_and_featurize(media, fake=True).collect()}
    assert again == {k: v["checksum"] for k, v in by_id.items()}


def test_multimodal_compressed_decode_is_stubbed(spark):
    """Non-P6 payloads (stand-ins for JPEG/PNG/audio) still raise under
    fake=False — only the uncompressed container decodes natively."""
    media = synth_media_table(spark, n=4)
    with pytest.raises(Exception) as exc:
        decode_and_featurize(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_ppm_codec_roundtrip_and_grammar():
    import numpy as np

    from tcr_kcore_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        synth_ppm_pixels,
    )

    pix = synth_ppm_pixels(7, 11, 5)
    data = encode_ppm(pix)
    assert np.array_equal(decode_ppm(data), pix)
    # netpbm grammar: comments + arbitrary whitespace in the header
    head, rest = data.split(b"\n", 1)
    assert np.array_equal(decode_ppm(head + b"\n# c1\n  # c2\n\t" + rest), pix)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated ppm payload"):
        decode_ppm(data[:-1])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated ppm header"):
        decode_ppm(b"P6\n2 2")


def test_ppm_real_decode_features_vs_numpy(spark):
    """fake=False end-to-end on real P6 payloads: header-parsed dims and
    post-decode checksums AND the 8-dim pixel statistics match an
    independent NumPy re-derivation, bit-for-bit (float64 both sides)."""
    import hashlib

    import numpy as np

    from tcr_kcore_spark.functions.multimodal import (
        decode_and_featurize,
        synth_ppm_media_table,
    )

    media = synth_ppm_media_table(spark, n=17, seed=9)
    rows = {r["sample_id"]: r for r in decode_and_featurize(media, fake=False).collect()}
    assert len(rows) == 17
    for i in range(17):
        sid = 9000 + i
        w, h = 8 + i % 5, 6 + i % 4
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        pix = ((13 * sid + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
        r = rows[sid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["checksum"] == hashlib.sha256(pix.tobytes()).hexdigest()[:16]
        f = pix.astype(np.float64) / 255.0
        expect = [
            f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(), f.std(),
            np.abs(np.diff(f, axis=1)).mean(), np.abs(np.diff(f, axis=0)).mean(),
            f.min(), f.max(),
        ]
        assert r["feat"] == [float(v) for v in expect], sid


def test_frame_sample_plan(spark):
    media = synth_media_table(spark, n=12)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    vids = {r["sample_id"] for r in media.where("modality = 'video'").collect()}
    assert {r["sample_id"] for r in rows} == vids
    # 30 frames, every 10th → indices 0, 10, 20
    per = {}
    for r in rows:
        per.setdefault(r["sample_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 10, 20] for v in per.values())


def test_streaming_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)

    streamed = run_stream_once(spark, src, query_name="t_events_agg")
    batch = hourly_counts_batch(spark.read.parquet(src))
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b
    assert len(a) > 0


def test_stateful_user_totals_matches_batch(spark, tmp_path):
    from tcr_kcore_spark.streaming.events import (
        read_event_stream,
        stateful_user_totals,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    src = str(tmp_path / "ev_state")
    events.write.parquet(src)

    out = stateful_user_totals(read_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("t_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.table("t_user_totals").collect()
    }
    exp = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == exp


def test_stream_dedup_first_seen(spark, tmp_path):
    from tcr_kcore_spark.streaming.events import (
        read_event_stream,
        stream_dedup_first_seen,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    src = str(tmp_path / "ev_dup")
    # write the same rows twice -> exact duplicates in the feed
    events.write.parquet(src)
    events.write.mode("append").parquet(src)

    out = stream_dedup_first_seen(read_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.table("t_dedup").select("event_id").distinct().count()
    total = spark.table("t_dedup").count()
    assert total == n == 500


def test_stateful_totals_across_micro_batches(spark, tmp_path):
    """State-store continuation: maxFilesPerTrigger=1 under availableNow
    forces one micro-batch PER FILE, so per-user running totals must carry
    through the state store across batches; the final emission per user
    equals the batch aggregation over all files."""
    from tcr_kcore_spark.streaming.events import (
        read_event_stream,
        stateful_user_totals,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(1200)
    src = str(tmp_path / "ev_mb")
    # four separate files -> four micro-batches
    events.repartition(4).write.parquet(src)

    out = stateful_user_totals(
        read_event_stream(spark, src, max_files_per_trigger=1)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_user_totals_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one emission per (user, batch-with-activity);
    # the FINAL emission (max n_events) is the running total
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.table("t_user_totals_mb")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        .select("user_id", "m.n_events", "m.sum_value")
        .collect()
    }
    exp = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == exp
    # and it genuinely ran as multiple batches: some user must have emitted
    # more than one running total
    emissions = spark.table("t_user_totals_mb").count()
    assert emissions > len(final)


def test_stream_dedup_across_micro_batches(spark, tmp_path):
    """Streaming dedup must drop a duplicate event_id arriving in a LATER
    micro-batch (the dropDuplicates state store, not just in-batch dedup)."""
    from tcr_kcore_spark.streaming.events import (
        read_event_stream,
        stream_dedup_first_seen,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(300)
    src = str(tmp_path / "ev_dup_mb")
    events.coalesce(1).write.parquet(src)                      # file/batch 1
    events.coalesce(1).write.mode("append").parquet(src)       # file/batch 2

    out = stream_dedup_first_seen(
        read_event_stream(spark, src, max_files_per_trigger=1)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("t_dedup_mb").count() == 300
    assert spark.table("t_dedup_mb").select("event_id").distinct().count() == 300


def test_resize_box_exact_truncating_mean():
    """Box-mean downsample equals an independent per-block loop (truncating
    integer mean); non-divisible dims fail loudly."""
    import numpy as np

    from tcr_kcore_spark.functions.multimodal import resize_box, synth_ppm_pixels

    pix = synth_ppm_pixels(7, 8, 6)  # 8x6, divisible by 2
    out = resize_box(pix, 2)
    assert out.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            for c in range(3):
                block = pix[2 * y : 2 * y + 2, 2 * x : 2 * x + 2, c].astype(int)
                assert out[y, x, c] == block.sum() // 4
    with pytest.raises(ValueError):
        resize_box(synth_ppm_pixels(7, 9, 6), 2)


def test_resize_nearest_identity_and_upscale():
    import numpy as np

    from tcr_kcore_spark.functions.multimodal import resize_nearest, synth_ppm_pixels

    pix = synth_ppm_pixels(3, 5, 4)
    assert (resize_nearest(pix, 5, 4) == pix).all()  # identity at same dims
    up = resize_nearest(pix, 10, 8)  # 2x upscale duplicates each pixel
    assert up.shape == (8, 10, 3)
    assert (up[::2, ::2] == pix).all() and (up[1::2, 1::2] == pix).all()


def test_resize_media_end_to_end(spark):
    """Spark resize_media output matches a driver-side NumPy re-derivation
    (decode -> nearest resize -> re-encode) row for row, and the emitted
    media is itself a valid P6 that decodes back to the resized pixels."""
    import hashlib

    import numpy as np

    from tcr_kcore_spark.functions.multimodal import (
        decode_ppm,
        resize_media,
        resize_nearest,
        synth_ppm_media_table,
        synth_ppm_pixels,
    )

    media = synth_ppm_media_table(spark, n=12, seed=9)
    rows = {r["sample_id"]: r for r in resize_media(media, out_w=5, out_h=3).collect()}
    assert len(rows) == 12
    for i in range(12):
        sid = 9 * 1000 + i
        w, h = 8 + i % 5, 6 + i % 4
        expect = resize_nearest(synth_ppm_pixels(sid, w, h), 5, 3)
        r = rows[sid]
        assert (r["width"], r["height"]) == (5, 3)
        assert r["checksum"] == hashlib.sha256(expect.tobytes()).hexdigest()[:16]
        assert (decode_ppm(bytes(r["media"])) == expect).all()


def test_resize_media_box_factor(spark):
    from tcr_kcore_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_box,
        resize_media,
        synth_ppm_pixels,
    )
    from tcr_kcore_spark.functions.multimodal import MEDIA_SCHEMA

    pix = synth_ppm_pixels(5, 8, 6)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(pix)), (8, 6, None, None))], MEDIA_SCHEMA
    )
    r = resize_media(df, factor=2).collect()[0]
    assert (r["width"], r["height"]) == (4, 3)
    assert (decode_ppm(bytes(r["media"])) == resize_box(pix, 2)).all()
