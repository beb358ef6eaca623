"""File-catalog source, multimodal plumbing, and streaming tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tagminder_spark.sources import (
    incremental_modified,
    incremental_new,
    prune_orphans,
    scan_files,
)
from tagminder_spark.sources.catalog import parse_tags, tags_to_columns
from tagminder_spark.sources.multimodal import (
    decode_and_featurize_images,
    sample_video_frames,
    synth_media,
)
from tagminder_spark.streaming import (
    run_stream_to_memory,
    sessionized_stream,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def catalog(spark):
    # Scan the testdata directory itself — real files, real listing.
    return scan_files(spark, SF_DIR, glob="*.parquet").cache()


def test_scan_files(catalog):
    rows = catalog.collect()
    names = {r.path.rsplit("/", 1)[-1] for r in rows}
    assert "lineitem.parquet" in names and len(rows) == 10
    assert all(r.size > 0 and r.mtime_epoch > 0 for r in rows)


def test_incremental_modes(spark, catalog):
    # catalog rows pretend to be the DB: drop two, age one.
    existing = (
        catalog.limit(8)
        .select(
            F.col("path").alias("__path"),
            F.when(
                F.col("path").endswith("orders.parquet"), F.lit("1")
            )  # ancient mtime → modified
            .otherwise(F.col("mtime_epoch").cast("string"))
            .alias("__file_mod_datetime_raw"),
        )
        .cache()
    )
    new = incremental_new(catalog, existing)
    assert new.count() == 2
    modified = incremental_modified(catalog, existing)
    assert modified.count() == 1
    assert modified.collect()[0].path.endswith("orders.parquet")
    ghost = spark.createDataFrame([("/nope/gone.flac", "1")], "`__path` string, `__file_mod_datetime_raw` string")
    orphans = prune_orphans(existing.unionByName(ghost), catalog)
    assert [r["__path"] for r in orphans.collect()] == ["/nope/gone.flac"]


def test_parse_tags_plumbing(spark, catalog):
    parsed = parse_tags(catalog.limit(3))
    rows = parsed.collect()
    assert len(rows) == 3
    assert all(r["__filetype"] == "parquet" for r in rows)
    wide = tags_to_columns(parsed, ["title", "artist"])
    w = wide.collect()
    assert {"__path", "title", "artist", "__extra_tags"} <= set(wide.columns)
    assert all(r.title for r in w)  # fallback parser fills title
    assert all("title" not in r["__extra_tags"] for r in w)


def test_multimodal_image_features(spark):
    media = synth_media(spark, 21)
    feats = decode_and_featurize_images(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 7  # every third item is an image
    assert all(len(r.feature) == 8 for r in rows)
    assert all(64 <= r.width <= 256 for r in rows)
    # determinism: same input → same features
    again = decode_and_featurize_images(media, dim=8).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_multimodal_real_ppm_decode_featurize(spark):
    """REAL codec path (round 8): valid PPM bytes decode to genuine
    pixels — width/height from the header, features = channel means of
    the actual gradient, no fake involved (the fake's md5-dims would
    differ)."""
    import numpy as np

    from tagminder_spark.sources.multimodal import (
        decode_ppm,
        make_ppm,
    )

    content = make_ppm(16, 9, seed=3)
    w, h, arr = decode_ppm(content)
    assert (w, h) == (16, 9) and arr.shape == (9, 16, 3)

    media = spark.createDataFrame(
        [(0, "image", bytearray(content),
          {"mime": "image/x-portable-pixmap", "width": None,
           "height": None, "duration_ms": None})],
        "media_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    row = decode_and_featurize_images(media, dim=6).collect()[0]
    assert (row["width"], row["height"]) == (16, 9)
    want = (arr.astype(np.float32).mean(axis=(0, 1)) / 255.0).repeat(3)[:6]
    assert np.allclose(row["feature"], want, atol=1e-6)


def test_multimodal_real_bmp_decode(spark):
    """Uncompressed 24-bit BMP parses with struct+numpy: bottom-up row
    order flipped, BGR→RGB swapped, 4-byte row padding honored."""
    import struct

    import numpy as np

    from tagminder_spark.sources.multimodal import decode_bmp

    # 2x2 image, rows padded to 4 bytes (2*3=6 → stride 8)
    px = {
        (0, 0): (255, 0, 0), (0, 1): (0, 255, 0),
        (1, 0): (0, 0, 255), (1, 1): (10, 20, 30),
    }
    rows = b""
    for y in (1, 0):  # bottom-up
        for x in (0, 1):
            r, g, b = px[(y, x)]
            rows += bytes([b, g, r])  # BGR
        rows += b"\x00\x00"  # pad
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows),
                      2835, 2835, 0, 0)
    )
    w, h, arr = decode_bmp(header + rows)
    assert (w, h) == (2, 2)
    for (y, x), rgb in px.items():
        assert tuple(int(v) for v in arr[y, x]) == rgb, (y, x)
    assert arr.dtype == np.uint8


def test_multimodal_real_png_roundtrip():
    """REAL PNG codec: encode (filter 0) → decode reproduces the exact
    pixels; corrupt CRC and truncation are rejected."""
    import numpy as np
    import pytest as _pytest

    from tagminder_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    src = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    blob = encode_png(src)
    w, h, got = decode_png(blob)
    assert (w, h) == (17, 13) and np.array_equal(got, src)

    bad = bytearray(blob)
    bad[40] ^= 0xFF  # flip a byte inside IHDR/IDAT region
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    with _pytest.raises(ValueError):
        decode_png(blob[:30])


def test_multimodal_real_png_all_filters_and_colortypes():
    """Hand-built PNGs exercising every scanline filter (Sub/Up/
    Average/Paeth) and the gray / gray+alpha / RGBA / palette color
    types — decoded pixels must equal the constructed ground truth."""
    import struct
    import zlib

    import numpy as np

    from tagminder_spark.sources.multimodal import decode_png

    def build(w, h, color, channels, scanlines, plte=None):
        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        out += chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
        return out + chunk(b"IEND", b"")

    # RGB 3x3 with rows filtered Sub(1), Up(2), Average(3) then a 4th
    # Paeth row — compute the filtered bytes from known pixels
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3) * 7 % 256
    rows = []
    # row 0: Sub — filt[i] = raw[i] - raw[i-3]
    r0 = px[0].reshape(-1).astype(np.int32)
    f0 = bytes([1]) + bytes(
        (r0[i] - (r0[i - 3] if i >= 3 else 0)) & 0xFF for i in range(9)
    )
    rows.append(f0)
    # row 1: Up — filt[i] = raw[i] - prev[i]
    r1 = px[1].reshape(-1).astype(np.int32)
    f1 = bytes([2]) + bytes((r1[i] - r0[i]) & 0xFF for i in range(9))
    rows.append(f1)
    # row 2: Paeth
    r2 = px[2].reshape(-1).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    f2 = bytes([4]) + bytes(
        (
            r2[i]
            - paeth(
                r2[i - 3] if i >= 3 else 0,
                r1[i],
                r1[i - 3] if i >= 3 else 0,
            )
        )
        & 0xFF
        for i in range(9)
    )
    rows.append(f2)
    w, h, got = decode_png(build(3, 3, 2, 3, rows))
    assert (w, h) == (3, 3) and np.array_equal(got, px)

    # Average filter on a 2-row grayscale image
    g = np.array([[10, 200, 30], [60, 120, 240]], dtype=np.uint8)
    ga = bytes([0]) + g[0].tobytes()
    r = g[1].astype(np.int32)
    p = g[0].astype(np.int32)
    favg = [0] * 3
    for i in range(3):
        a = r[i - 1] if i >= 1 else 0
        # careful: 'a' must be the RECONSTRUCTED previous pixel == g[1][i-1]
        a = g[1][i - 1] if i >= 1 else 0
        favg[i] = (r[i] - ((int(a) + p[i]) >> 1)) & 0xFF
    _, _, gotg = decode_png(build(3, 2, 0, 1, [ga, bytes([3]) + bytes(favg)]))
    assert np.array_equal(gotg[:, :, 0], g) and np.array_equal(
        gotg[:, :, 0], gotg[:, :, 2]
    )

    # palette: 2 colors, 1x2 image
    plte = bytes([255, 0, 0, 0, 0, 255])
    _, _, gotp = decode_png(
        build(2, 1, 3, 1, [bytes([0, 0, 1])], plte=plte)
    )
    assert gotp[0, 0].tolist() == [255, 0, 0]
    assert gotp[0, 1].tolist() == [0, 0, 255]

    # RGBA drops alpha
    rgba = bytes([0]) + bytes([1, 2, 3, 9, 4, 5, 6, 8])
    _, _, gota = decode_png(build(2, 1, 6, 4, [rgba]))
    assert gota[0, 0].tolist() == [1, 2, 3]
    assert gota[0, 1].tolist() == [4, 5, 6]


def test_multimodal_real_png_featurize(spark):
    """A real PNG flows through the Spark featurize path with genuine
    dims and channel means (not the md5 fake)."""
    import numpy as np

    from tagminder_spark.sources.multimodal import (
        decode_and_featurize_images,
        encode_png,
    )

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, "image", bytearray(encode_png(src)),
          {"mime": "image/png", "width": None, "height": None,
           "duration_ms": None})],
        "media_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    row = decode_and_featurize_images(media, dim=6).collect()[0]
    assert (row["width"], row["height"]) == (20, 12)
    want = (src.astype(np.float32).mean(axis=(0, 1)) / 255.0).repeat(3)[:6]
    assert np.allclose(row["feature"], want, atol=1e-6)


def test_multimodal_real_wav_chunking(spark):
    """REAL audio path: a genuine 16-bit PCM WAV decodes via stdlib
    wave; chunk windows are sample-accurate (chunk bytes == the exact
    PCM frame range, verified against the decoded array)."""
    import numpy as np

    from tagminder_spark.sources.multimodal import (
        chunk_audio,
        decode_wav,
        make_wav,
    )

    content = make_wav(250, rate=8000, seed=1)  # 2000 frames
    rate, nch, samples = decode_wav(content)
    assert (rate, nch, samples.shape[0]) == (8000, 1, 2000)

    media = spark.createDataFrame(
        [(0, "audio", bytearray(content),
          {"mime": "audio/wav", "width": None, "height": None,
           "duration_ms": None})],
        "media_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    chunks = sorted(
        chunk_audio(media, window_ms=100, hop_ms=60).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # duration 250 ms → starts 0,60,120,180,240
    assert [c["start_ms"] for c in chunks] == [0, 60, 120, 180, 240]
    for c in chunks:
        f0 = c["start_ms"] * rate // 1000
        f1 = min(-(-(c["end_ms"] * rate) // 1000), samples.shape[0])
        assert bytes(c["chunk_bytes"]) == samples[f0:f1].tobytes(), c["chunk_idx"]


def test_multimodal_real_ppm_resize(spark):
    """REAL resize path: PPM in → nearest-neighbor resample → PPM out;
    the output pixels equal the numpy index-map resample of the input."""
    import numpy as np

    from tagminder_spark.sources.multimodal import (
        decode_ppm,
        make_ppm,
        resize_images,
    )

    content = make_ppm(20, 10, seed=7)
    _, _, src = decode_ppm(content)
    media = spark.createDataFrame(
        [(0, "image", bytearray(content),
          {"mime": "image/x-portable-pixmap", "width": None,
           "height": None, "duration_ms": None})],
        "media_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    row = resize_images(media, target_w=8, target_h=4).collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    w2, h2, got = decode_ppm(bytes(row["resized"]))
    assert (w2, h2) == (8, 4)
    ys = (np.arange(4) * 10 // 4).clip(0, 9)
    xs = (np.arange(8) * 20 // 8).clip(0, 19)
    assert np.array_equal(got, src[ys][:, xs])


def test_multimodal_frame_sampling(spark):
    media = synth_media(spark, 21)
    frames = sample_video_frames(media, every_ms=1000)
    pdf = frames.toPandas()
    assert set(pdf.media_id.unique()) == {2, 5, 8, 11, 14, 17, 20}
    # fan-out: one frame per reported second
    n5 = len(pdf[pdf.media_id == 5])
    assert n5 == (5000 + 5 * 1000) // 1000


def test_streaming_windowed_counts_matches_batch(spark):
    stream = windowed_event_counts(spark, SF_DIR)
    got = run_stream_to_memory(stream, "stream_counts", mode="complete")
    from tagminder_spark.session import load_table

    # Read the batch side through the shared loader rather than re-implementing
    # one testdata generation's ts encoding — load_table normalizes nanos/naive
    # parquet timestamps identically for batch and the streaming twin.
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    g = {(r.window_start, r.event_type): r.n for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert g == b


def test_streaming_sessions(spark):
    stream = sessionized_stream(spark, SF_DIR, gap="30 minutes")
    got = run_stream_to_memory(stream, "stream_sessions", mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)
    # session count per user must match the batch lag+cumsum plan
    from tagminder_spark.queries.relational import t_sessionize

    batch = {r.user_id: r.n_sessions for r in t_sessionize(spark, SF_DIR).collect()}
    stream_counts: dict[int, int] = {}
    for r in rows:
        stream_counts[r.user_id] = stream_counts.get(r.user_id, 0) + 1
    assert stream_counts == batch


def test_resize_images_plumbing(spark):
    from tagminder_spark.sources.multimodal import resize_images, synth_media

    media = synth_media(spark, 12)
    out = resize_images(media, 128, 96)
    rows = out.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images > 0
    for r in rows:
        assert r["target_w"] == 128 and r["target_h"] == 96
        assert r["width"] >= 64 and r["height"] >= 64
        assert isinstance(r["resized"], (bytes, bytearray)) and len(r["resized"]) > 0
    # deterministic fake: same input → same payload
    again = {r["media_id"]: bytes(r["resized"]) for r in resize_images(media, 128, 96).collect()}
    assert {r["media_id"]: bytes(r["resized"]) for r in rows} == again


def test_streaming_dedup_probe_matches_batch(spark, tmp_path):
    """Micro-batched probe over a file stream == the batch incremental
    operator over the same split (docs with doc_id % 5 == 0 stream in
    against the standing index of the rest)."""
    from tagminder_spark.operators.dedupe import (
        incremental_lsh_pairs,
        lsh_index,
    )
    from tagminder_spark.session import load_table
    from tagminder_spark.streaming.ingest import streaming_dedup_probe

    docs = load_table(spark, SF_DIR, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new.coalesce(2).write.parquet(str(tmp_path / "incoming"))

    standing = lsh_index(old, "doc_id", "text")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "incoming"))
    )
    q = streaming_dedup_probe(stream, standing)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    batch = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in incremental_lsh_pairs(
            lsh_index(new, "doc_id", "text"), standing, threshold=0.5
        ).collect()
    }
    got = set(q.collected_pairs)
    # every within-batch-file pair and every batch-vs-standing pair of
    # the monolithic run must be found; micro-batching may only MISS
    # pairs straddling two files of the new split — none exist here
    # because near-dup doc pairs in the fixture share the id%5 file
    assert got == batch


def test_streaming_dedup_probe_bounds_default_sink(spark, tmp_path):
    """ADVICE r7: the default in-memory sink is capped — a pathological
    batch cannot balloon the driver list past max_collected."""
    from tagminder_spark.operators.dedupe import lsh_index
    from tagminder_spark.session import load_table
    from tagminder_spark.streaming.ingest import streaming_dedup_probe

    docs = load_table(spark, SF_DIR, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new.coalesce(1).write.parquet(str(tmp_path / "incoming"))

    standing = lsh_index(old, "doc_id", "text")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "incoming"))
    )
    q = streaming_dedup_probe(stream, standing, max_collected=1)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    assert len(q.collected_pairs) <= 1
    assert q.dropped_batches[0] >= 1  # the overflow was seen and logged


def test_chunk_audio_boundaries_and_bytes(spark):
    """Overlapping windows: 25-byte content at 10ms/byte = 250ms dur,
    window 100ms hop 60ms -> starts 0,60,120,180,240; byte ranges
    proportional with ceil on the end; last chunk partial."""
    import pyspark.sql.functions as F

    from tagminder_spark.sources.multimodal import chunk_audio

    payload = bytes(range(25))
    media = spark.createDataFrame(
        [(1, "audio", payload), (2, "image", b"zz"), (3, "audio", b"")],
        "media_id long, kind string, content binary",
    )
    rows = sorted(
        chunk_audio(media, window_ms=100, hop_ms=60, ms_per_byte=10).collect(),
        key=lambda r: (r.media_id, r.chunk_idx),
    )
    # only kind='audio' with nonempty content fans out
    assert [r.media_id for r in rows] == [1] * 5
    assert [(r.start_ms, r.end_ms) for r in rows] == [
        (0, 100), (60, 160), (120, 220), (180, 250), (240, 250)
    ]
    assert bytes(rows[0].chunk_bytes) == payload[0:10]
    assert bytes(rows[1].chunk_bytes) == payload[6:16]
    assert bytes(rows[3].chunk_bytes) == payload[18:25]
    assert bytes(rows[4].chunk_bytes) == payload[24:25]


def test_curation_quality_gate_stream_equals_batch(spark, tmp_path):
    """The composed ingest quality gate (repetition + PII + quality) is
    one map-only plan: driving it as a file stream through a parquet
    sink (with checkpoint) yields EXACTLY the batch result."""
    import pyspark.sql.functions as F

    from tagminder_spark.session import load_table
    from tagminder_spark.streaming.ingest import curation_quality_gate
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    docs.write.parquet(str(src))
    want = {tuple(r) for r in curation_quality_gate(docs).collect()}

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .load(str(src))
    )
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        curation_quality_gate(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert got == want and len(got) > 0


def test_chunk_audio_rejects_nonpositive_params(spark):
    """hop_ms/ms_per_byte/window_ms <= 0 must fail on the DRIVER — inside
    the executor loop a zero hop spins forever (round-6 ADVICE)."""
    import pytest as _pytest

    from tagminder_spark.sources.multimodal import chunk_audio, synth_media

    media = synth_media(spark, n=2)
    for kw in ({"hop_ms": 0}, {"hop_ms": -5}, {"ms_per_byte": 0}, {"window_ms": 0}):
        with _pytest.raises(ValueError):
            chunk_audio(media, **kw)


def test_streaming_ingest_with_auto_maintenance(spark, tmp_path):
    """Continuous ingest + automatic selective compaction: micro-batches
    append small files, every 2nd batch the planner bin-packs fragmented
    directories; row content is exactly the union of all batches and
    maintenance actually ran and shrank files."""
    from tagminder_spark.operators.compaction import (
        list_data_files,
        plan_compaction,
    )
    from tagminder_spark.session import load_table
    from tagminder_spark.streaming.ingest import (
        streaming_ingest_with_maintenance,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    # 6 source files → 6 micro-batches with maxFilesPerTrigger=1
    docs.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = streaming_ingest_with_maintenance(
        stream, table,
        partition_col="lang",
        maintenance_every=2,
        target_bytes=4 << 20,
        min_files=4,
    )
    q.processAllAvailable()
    q.stop()

    # every ingested row present exactly once
    back = spark.read.parquet(table)
    a = sorted((r["doc_id"], r["lang"]) for r in back.collect())
    b = sorted((r["doc_id"], r["lang"]) for r in docs.collect())
    assert a == b

    # maintenance fired and did real work
    assert q.maintenance_reports, "no maintenance pass ran"
    for rep in q.maintenance_reports:
        assert rep["files_out"] <= rep["files_in"]
    # after the final maintenance, fragmentation is bounded: one more
    # manual pass finds at most the post-maintenance appends
    plan = plan_compaction(
        spark, table, target_bytes=4 << 20, min_files=4
    )
    files_per_dir = max(
        s["files"] for s in plan["dirs"].values()
    )
    # without maintenance every lang dir would hold ~6 files (one per
    # batch); with it, the worst dir holds fewer than the batch count
    n_langs = docs.select("lang").distinct().count()
    total_files = len(list_data_files(spark, table))
    assert total_files < 6 * n_langs, (total_files, n_langs)
    assert files_per_dir <= 4


def _fold_probe_fixture(spark, tmp_path):
    """Three deterministic micro-batches (one file each, mtime-ordered)
    with controlled near-dup pairs: (11,12) in-batch, (13,14) split
    across batches 0/1 (same fold window), (1,2) split across batches
    0/2 (fold boundary between them)."""
    import os
    import shutil

    base = "the quick brown fox jumps over the lazy dog " * 5
    batches = [
        [(1, base + "alpha"), (10, "completely unrelated filler one xyzzy"),
         (11, base + "beta"), (12, base + "beta prime"),
         (13, base + "gamma")],
        [(20, "another unrelated filler two plugh"),
         (14, base + "gamma prime")],
        [(2, base + "alpha prime"),
         (30, "third unrelated filler three frobozz")],
    ]
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    for i, rows in enumerate(batches):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = incoming / f"b{i}.parquet"
        shutil.move(str(part), str(dst))
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    all_rows = [r for b in batches for r in b]
    corpus = spark.createDataFrame(all_rows, "doc_id long, text string")
    empty = corpus.limit(0)
    return incoming, corpus, empty


def _run_probe(spark, incoming, empty_docs, fold_every, finalize):
    from tagminder_spark.operators.dedupe import lsh_index
    from tagminder_spark.streaming.ingest import streaming_dedup_probe

    standing = lsh_index(empty_docs, "doc_id", "text")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(incoming))
    )
    q = streaming_dedup_probe(stream, standing, fold_every=fold_every)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    if finalize:
        q.finalize()
    return {(a, b) for a, b, _ in q.collected_pairs}


def test_dedup_probe_cross_batch_gap_without_fold(spark, tmp_path):
    """Documents the structural gap the fold cadence exists to close:
    without fold_every, pairs split across micro-batches are invisible;
    in-batch pairs are found."""
    incoming, _corpus, empty = _fold_probe_fixture(spark, tmp_path)
    got = _run_probe(spark, incoming, empty, fold_every=None, finalize=False)
    assert (11, 12) in got          # in-batch pair
    assert (1, 2) not in got        # split batches 0/2 — the gap
    assert (13, 14) not in got      # split batches 0/1 — the gap


def test_dedup_probe_fold_in_closes_cross_batch_recall(spark, tmp_path):
    """VERDICT r8 #3 done-criteria: (a) a near-dup pair arriving in
    batches 1 and 3 is flagged after the batch-2 maintenance fold —
    WITHOUT finalize; (b) after the final fold-in the streamed pair set
    equals the batch operator's over the same corpus."""
    from tagminder_spark.operators.dedupe import minhash_lsh_pairs

    incoming, corpus, empty = _fold_probe_fixture(spark, tmp_path)

    # (a) fold after batch 2 puts batch 0's docs in the standing index,
    # so batch 3's probe flags (1, 2) mid-stream
    got_mid = _run_probe(spark, incoming, empty, fold_every=2, finalize=False)
    assert (1, 2) in got_mid
    assert (13, 14) in got_mid  # window-internal split pair: emitted by
    # the fold's cross-batch probe (batch_id = -1 path)

    # (b) recall equality after finalize: streamed == batch operator
    got = _run_probe(spark, incoming, empty, fold_every=2, finalize=True)
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "doc_id", "text").collect()
    }
    assert got == want
    assert {(1, 2), (11, 12), (13, 14)} <= want  # fixture is non-trivial


def test_dedup_probe_fold_latest_version_wins(spark, tmp_path):
    """ADVICE r9: an id RE-INGESTED across two pending batches of the
    same fold window must contribute only its newest version — (a) the
    window cross-probe's Jaccard is computed on the new shingles alone
    (merged old+new shingles would dilute it below threshold), (b) the
    fold leaves exactly one version in the standing index, and (c) the
    final pair set equals the batch operator's over the LATEST corpus."""
    import os
    import shutil

    from tagminder_spark.operators.dedupe import lsh_index, minhash_lsh_pairs
    from tagminder_spark.streaming.ingest import streaming_dedup_probe

    base = "the quick brown fox jumps over the lazy dog " * 5
    stale = (
        "entirely different placeholder words occupying roughly the same "
        "shingle volume as the base text so the diluted union would sink "
        "the true jaccard beneath the threshold for sure " * 2
    )
    batches = [
        [(51, base + "delta prime"), (50, stale),
         (60, "unrelated filler one xyzzy")],
        [(61, "unrelated filler two plugh")],
        [(50, base + "delta"), (62, "unrelated filler three frobozz")],
    ]
    incoming = tmp_path / "incoming2"
    incoming.mkdir()
    for i, rows in enumerate(batches):
        stage = tmp_path / f"restage{i}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dst = incoming / f"b{i}.parquet"
        shutil.move(str(part), str(dst))
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    latest = {}
    for rows in batches:
        for i_, t_ in rows:
            latest[i_] = t_
    corpus = spark.createDataFrame(
        sorted(latest.items()), "doc_id long, text string"
    )
    empty = corpus.limit(0)

    standing = lsh_index(empty, "doc_id", "text")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(incoming))
    )
    q = streaming_dedup_probe(stream, standing, fold_every=3)
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    q.finalize()
    got = {(a, b) for a, b, _ in q.collected_pairs}
    jac = {(a, b): j for a, b, j in q.collected_pairs}

    # (a) the split pair is found, at the NEW version's similarity
    assert (50, 51) in got
    assert jac[(50, 51)] >= 0.5

    # (b) one version in the folded standing index: id 50's shingles
    # equal a fresh index over the new text alone
    _, folded_sh = q.fold_state["standing"]
    new_only = lsh_index(
        corpus.filter("doc_id = 50"), "doc_id", "text"
    )[1]
    got_sh = folded_sh.filter("id = 50").count()
    assert got_sh == new_only.count(), (got_sh, new_only.count())

    # (c) recall equality against the batch operator over LATEST corpus
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "doc_id", "text").collect()
    }
    assert got == want and (50, 51) in want


def test_streaming_upsert_mode_latest_wins(spark, tmp_path):
    """upsert_key turns the manifest ingest loop into a streaming
    UPSERT: re-ingested keys supersede by commit sequence, maintenance
    materializes the pending deletes, and the final snapshot is
    latest-wins — with zero data files rewritten on the merge path."""
    import time as _time

    from pyspark.sql import functions as F

    from tagminder_spark.operators.table_manifest import (
        read_manifest,
        snapshot_read,
    )
    from tagminder_spark.session import load_table
    from tagminder_spark.streaming.ingest import (
        streaming_ingest_with_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    # batches 0-2: initial thirds; batch 3: re-ingest of a slice with a
    # new value (written LAST so the file source orders it after)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.1)
    updated = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "n_chars", F.lit(-1).cast("long")
    )
    updated.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = streaming_ingest_with_maintenance(
        stream, table,
        partition_col="lang", maintenance_every=2,
        target_bytes=4 << 20, min_files=4,
        use_manifest=True, upsert_key="doc_id",
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["doc_id"]: r["n_chars"]
        for r in snapshot_read(spark, table).collect()
    }
    assert len(got) == docs.count()  # upsert: no duplicate keys
    for row in docs.collect():
        want = -1 if row["doc_id"] % 5 == 0 else row["n_chars"]
        assert got[row["doc_id"]] == want, row["doc_id"]
    # batch 3 (the merge) is a maintenance batch, so its pass
    # materialized the pending delete and the final chain is clean
    assert any(rep.get("materialized") for rep in q.maintenance_reports)
    assert read_manifest(spark, table)["deletes"] == []
