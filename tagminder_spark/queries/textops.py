"""Text-analysis queries over the documents/events tables: language-ID,
quality scoring, token counting, fingerprinting, tumbling-window rollup.

These are the training-data-pipeline operators layered on top of the
reference's string-function surface (SURVEY.md §2.8); each delegates to
``tagminder_spark.operators.text`` and carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    marker_hits,
    quality_score,
    regex_token_count,
    word_count,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import fuse_pandas, load_table, spread

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _hits_sql(words: tuple[str, ...]) -> str:
    """DuckDB twin of operators.text.marker_hits (no regexp_count in 1.0)."""
    padded = "' ' || lower(text) || ' '"
    terms = [
        f"len(regexp_extract_all({padded}, ' {w} '))" for w in words
    ]
    return "(" + " + ".join(terms) + ")"


# The score bands derive from length(text) — the SAME definition the
# Spark side (operators/text.quality_score) uses — NOT the stored
# n_chars column. The two coincide on the driver's testdata, but the
# round-6 sf1 value sweep caught them diverging on a corpus whose text
# was mutated without refreshing n_chars: one definition, stated once.
_QUALITY_SQL = f"""
WITH m AS (
  SELECT doc_id, n_chars, length(text) AS t_chars,
         len(string_split(trim(text), ' ')) AS n_words,
         {_hits_sql(STOPWORDS)} AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, CAST(n_words AS INT) AS n_words,
       CAST(ROUND(
         0.4 * (CASE WHEN t_chars >= 100 AND t_chars <= 2000 THEN 1.0 ELSE 0.3 END)
       + 0.3 * (CASE WHEN (t_chars - n_words + 1) * 1.0 / n_words >= 3.0
                      AND (t_chars - n_words + 1) * 1.0 / n_words <= 10.0
                     THEN 1.0 ELSE 0.4 END)
       + 0.3 * (CASE WHEN stop_hits * 1.0 / n_words <= 0.5 THEN 1.0 ELSE 0.5 END)
       , 4) AS DOUBLE) AS quality
FROM m
"""


@q("t_quality_score", _QUALITY_SQL)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length band + mean-word-length band +
    stopword-excess band → composite [0,1] score. Pure expressions; at
    100 TB this is a map-only pass with zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        word_count(F.col("text")).cast("int").alias("n_words"),
        quality_score(F.col("text")).cast("double").alias("quality"),
    )


_LANG_CASES = " ".join(
    f"WHEN '{lang}' THEN {_hits_sql(words)}" for lang, words in LANG_MARKERS.items()
)

_LANGID_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
         {_hits_sql(LANG_MARKERS["en"])} AS s_en,
         {_hits_sql(LANG_MARKERS["es"])} AS s_es,
         {_hits_sql(LANG_MARKERS["de"])} AS s_de,
         {_hits_sql(LANG_MARKERS["fr"])} AS s_fr
  FROM documents
)
SELECT doc_id, CAST(s_en AS INT) AS s_en, CAST(s_es AS INT) AS s_es,
       CAST(s_de AS INT) AS s_de, CAST(s_fr AS INT) AS s_fr,
       CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
            WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted,
       CASE WHEN (CASE WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
                       WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
                       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) = lang
            THEN 1 ELSE 0 END AS is_match
FROM s
"""


@q("t_langid_heuristic", _LANGID_SQL)
def t_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language marker-stopword hit counts →
    deterministic argmax with fixed priority order. The column contract
    (scores + predicted + match flag) is what a real char-n-gram model
    would slot into."""
    d = load_table(spark, sf_dir, "documents")
    scores = {
        lang: marker_hits(F.col("text"), words).cast("int")
        for lang, words in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            scores["en"]
            >= F.greatest(scores["es"], scores["de"], scores["fr"]),
            F.lit("en"),
        )
        .when(scores["es"] >= F.greatest(scores["de"], scores["fr"]), F.lit("es"))
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        scores["en"].alias("s_en"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        scores["fr"].alias("s_fr"),
        pred.alias("predicted"),
        (pred == F.col("lang")).cast("int").alias("is_match"),
    )


_TOKCOUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS re_tokens
FROM documents
"""


@q("t_token_count", _TOKCOUNT_SQL)
def t_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish maximal
    alnum-run regex — the per-document cost metric of training pipelines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count(F.col("text")).cast("int").alias("ws_tokens"),
        regex_token_count(F.col("text")).cast("int").alias("re_tokens"),
    )


_FP_SQL = """
SELECT doc_id,
       list_reduce(
         list_transform(string_split_regex(lower(trim(text)), ''), c -> CAST(ascii(c) AS BIGINT)),
         (a, b) -> (a * 31 + b) % 2147483647
       ) AS fp
FROM documents
"""


@q("t_fingerprint", _FP_SQL)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: base-31 polynomial rolling hash over the
    normalized character stream (left fold ⇒ identical in any engine)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


_CHUNK_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')
           AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         GREATEST(1, CAST(CEIL((len(toks) - 16) / 48.0) AS BIGINT)) AS k
  FROM d WHERE len(toks) > 0
)
SELECT doc_id, i AS chunk_id,
       array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ')
         AS chunk_text,
       LEAST(64, n - i * 48) AS n_tokens
FROM s, LATERAL (SELECT unnest(range(0, k)) AS i)
"""


@q("t_chunk_windows", _CHUNK_SQL)
def t_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context chunking (64-token windows, 16 overlap) —
    the LM training-data preparation step between curation and packing.
    Map-only tokenize→sequence→explode→slice; the oracle replays the
    closed-form chunk count and list slicing."""
    from tagminder_spark.operators.curation import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, window=64, overlap=16)


_WINDOW_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@q("t_tumbling_window", _WINDOW_SQL)
def t_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup via F.window — the batch twin of the
    Structured Streaming ingest aggregation (tagminder_spark.streaming);
    same logical plan both ways, which is the point of migrating the
    reference's batch-only incrementality (§2.11) to Spark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# stateful streaming dedup (applyInPandasWithState)
# --------------------------------------------------------------------------

_STATEFUL_SQL = """
SELECT lang AS key,
       CAST(1 AS BIGINT) AS n_new,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM documents GROUP BY lang
"""


@q("t_stateful_dedup", _STATEFUL_SQL)
def t_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-seen dedup via applyInPandasWithState
    (streaming/stateful.py): documents streamed from the parquet file,
    per-key state marks seen keys, output = (key, n_new, n_dropped).
    One source file ⇒ one micro-batch ⇒ the result is deterministic and
    oracle-checkable: every key yields exactly one first-seen row."""
    import uuid

    from tagminder_spark.streaming.ingest import run_stream_to_memory
    from tagminder_spark.streaming.stateful import streaming_first_seen_dedup

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    out = streaming_first_seen_dedup(stream.select("lang"), "lang")
    name = f"t_stateful_dedup_{uuid.uuid4().hex[:8]}"
    return run_stream_to_memory(out, name)


_MM_SQL = """
WITH m AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents)
SELECT media_id,
       64 + CAST('0x' || substr(hx, 1, 2) AS INT) % 192 AS width,
       64 + CAST('0x' || substr(hx, 3, 2) AS INT) % 192 AS height,
       3 AS channels,
       8 AS n_feat
FROM m
"""


@q("mm_image_features", _MM_SQL)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/featurize plumbing, value-checked end to end:
    documents' text becomes the opaque binary content column, the
    mapInPandas kernel (sources/multimodal.py) batches it through Arrow
    and emits per-media dims + a feature vector. The deterministic fake
    codec derives dims from md5(content), so the oracle replays the
    exact Pandas-UDF output in SQL — proving the binary column, batch
    shape, and UDF signature carry real data (only the codec kernel
    itself swaps for Pillow/ffmpeg on a real image)."""
    from tagminder_spark.sources.multimodal import decode_and_featurize_images

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    feats = decode_and_featurize_images(media, dim=8)
    return feats.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.size("feature").alias("n_feat"),
    )


# the REAL decode path, oracle-gated (round 8): PPM pixel math is exact
# integer arithmetic, so DuckDB replays the per-channel pixel SUMS of
# the genuinely-decoded image over a generated (x, y) grid — this gate
# fails if the actual decoder misreads a single pixel
_MM_REAL_SQL = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
         (doc_id * 131) % 256 AS base
  FROM documents
), grid AS (
  -- DuckDB's generate_series can't take correlated bounds: generate
  -- the max grid (w <= 16, h <= 13) and filter per document
  SELECT d.doc_id, d.w, d.h, d.base, x.generate_series AS x,
         y.generate_series AS y
  FROM d, generate_series(0, 15) AS x, generate_series(0, 12) AS y
  WHERE x.generate_series < d.w AND y.generate_series < d.h
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(((x * 255) // (w - 1) + base) % 256) AS BIGINT) AS sum_r,
       CAST(SUM(((y * 255) // (h - 1)) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((x + y + base) % 256) AS BIGINT) AS sum_b
FROM grid GROUP BY doc_id
"""


@q("mm_real_image_features", _MM_REAL_SQL)
def mm_real_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, value-checked against an analytic oracle: a
    mapInPandas stage synthesizes a valid binary PPM per document
    (gradient pixels — pure integer formulas of (x, y, doc_id)), the
    GENUINE decoder (sources/multimodal.py decode_ppm — no fake, no
    Pillow) parses it back, and the featurizer's channel means are
    converted to exact integer pixel SUMS (mean × 255 × w × h rounds
    to the true sum well inside float32 error).  DuckDB computes the
    same sums directly over a generated pixel grid, so a single
    misread pixel value fails the gate.  Evidence upgrade for the
    multimodal row: the real codec path is now oracle-gated, not just
    pytest-covered."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        encode_ppm,
        image_features_kernel,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                w, h, base = 4 + did % 13, 3 + did % 11, (did * 131) % 256
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (x * 255 // (w - 1) + base) % 256,
                        (y * 255 // (h - 1)) % 256,
                        (x + y + base) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_ppm(arr),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    # fused synth→decode→featurize: one Python worker per task, the
    # container bytes never cross the Arrow boundary (guide §4; see
    # session.fuse_pandas)
    feats = spread(d).mapInPandas(
        fuse_pandas(synth, image_features_kernel(dim=9)),
        IMAGE_FEATURES_SCHEMA,
    )
    px = F.col("width") * F.col("height")
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * 255 * px)
        .cast("long")
        .alias("sum_r"),
        F.round(F.element_at("feature", 5) * 255 * px)
        .cast("long")
        .alias("sum_g"),
        F.round(F.element_at("feature", 9) * 255 * px)
        .cast("long")
        .alias("sum_b"),
    )


# the REAL PNG decode path, oracle-gated (round 9, VERDICT r8 #4):
# zlib-compressed scanlines with ALL FIVE filters (row y uses filter
# y % 5) across three color types (gray / RGB / RGBA by doc_id % 3) —
# a single wrong byte in the filter reconstruction or color expansion
# fails the pixel-sum comparison
_MM_PNG_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 3 AS t, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
         (doc_id * 131) % 256 AS base
  FROM documents
), grid AS (
  SELECT d.doc_id, d.t, d.w, d.h, d.base, x.generate_series AS x,
         y.generate_series AS y
  FROM d, generate_series(0, 15) AS x, generate_series(0, 12) AS y
  WHERE x.generate_series < d.w AND y.generate_series < d.h
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(((x * 255) // (w - 1) + base) % 256) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN t = 0 THEN ((x * 255) // (w - 1) + base) % 256
                     ELSE ((y * 255) // (h - 1)) % 256 END) AS BIGINT)
         AS sum_g,
       CAST(SUM(CASE WHEN t = 0 THEN ((x * 255) // (w - 1) + base) % 256
                     ELSE (x + y + base) % 256 END) AS BIGINT) AS sum_b
FROM grid GROUP BY doc_id
"""


@q("mm_real_png_features", _MM_PNG_SQL)
def mm_real_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, value-checked against an analytic oracle (the
    ``mm_real_image_features`` pattern, upgraded to the compressed
    codec): each document synthesizes a VALID PNG — zlib-deflated
    scanlines where row ``y`` is filtered with type ``y % 5`` (None/
    Sub/Up/Average/Paeth all exercised) and the color type rotates
    gray → RGB → RGBA by ``doc_id % 3`` — then the GENUINE stdlib-zlib
    decoder (``sources/multimodal.py: decode_png``) reconstructs the
    pixels and the featurizer's channel means convert to exact integer
    pixel sums.  Grayscale docs must decode to equal R=G=B sums (the
    gray→RGB expansion), RGBA docs must drop alpha.  DuckDB computes
    the same sums over a generated pixel grid; one misreconstructed
    filter byte fails the gate."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        encode_png,
        image_features_kernel,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                t = did % 3
                w, h, base = 4 + did % 13, 3 + did % 11, (did * 131) % 256
                y, x = np.mgrid[0:h, 0:w]
                red = (x * 255 // (w - 1) + base) % 256
                if t == 0:
                    arr = red[:, :, None]
                else:
                    chans = [
                        red,
                        (y * 255 // (h - 1)) % 256,
                        (x + y + base) % 256,
                    ]
                    if t == 2:
                        chans.append((x * y + base) % 256)  # alpha, dropped
                    arr = np.stack(chans, axis=-1)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_png(
                            arr.astype(np.uint8), filters="cycle"
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    # fused synth→decode→featurize: one Python worker per task, the
    # container bytes never cross the Arrow boundary (guide §4; see
    # session.fuse_pandas)
    feats = spread(d).mapInPandas(
        fuse_pandas(synth, image_features_kernel(dim=9)),
        IMAGE_FEATURES_SCHEMA,
    )
    px = F.col("width") * F.col("height")
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * 255 * px)
        .cast("long")
        .alias("sum_r"),
        F.round(F.element_at("feature", 5) * 255 * px)
        .cast("long")
        .alias("sum_g"),
        F.round(F.element_at("feature", 9) * 255 * px)
        .cast("long")
        .alias("sum_b"),
    )


# the REAL baseline-JPEG decode path, oracle-gated (round 10, VERDICT
# r9 #6): a lossy codec is made bit-exact by synthesizing images on its
# FIXED POINTS — every 8x8 block is an even constant v plus the (0,4)
# cosine basis scaled to integers (pixel = v + 2*s(x%8) with
# s = [+,-,-,+,+,-,-,+]), whose DCT is exactly DC=8(v-128) and
# F(0,4)=16, both exact multiples of the flat quant step 16.  The scan
# therefore exercises DC diff coding (varying sign), a 13-zero AC run,
# EOB, Huffman tables parsed from DHT, and the IDCT — and one wrong bit
# anywhere breaks the pixel-sum comparison.  sum_col0/sum_col1 pin the
# pattern's SIGNS (the full-block sum alone would cancel them).
_MM_JPEG_SQL = """
WITH d AS (
  SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
  FROM documents
), blocks AS (
  SELECT d.doc_id, d.w, d.h,
         bx.generate_series AS bx, by.generate_series AS by,
         2 * ((d.doc_id * 37 + bx.generate_series * 11
               + by.generate_series * 23) % 100) + 28 AS v
  FROM d, generate_series(0, 2) AS bx, generate_series(0, 1) AS by
  WHERE bx.generate_series < d.w // 8 AND by.generate_series < d.h // 8
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(64 * v) AS BIGINT) AS sum_all,
       CAST(SUM(8 * (v + 2)) AS BIGINT) AS sum_col0,
       CAST(SUM(8 * (v - 2)) AS BIGINT) AS sum_col1
FROM blocks GROUP BY doc_id
"""


@q("mm_real_jpeg_features", _MM_JPEG_SQL)
def mm_real_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, value-checked against an analytic
    oracle: each document synthesizes a VALID baseline JPEG (markers,
    DHT Huffman tables, byte-stuffed entropy data — gray for even
    doc_ids, RGB with R=G=B for odd, so the YCbCr leg runs with neutral
    chroma), the GENUINE pure-python decoder
    (``sources/jpeg.py: decode_jpeg``) reconstructs the pixels, and
    exact integer pixel sums (whole image + the x%8==0 and x%8==1
    column families, which pin the cosine pattern's signs) are compared
    to DuckDB's analytic replay of the generator formulas.  The
    fixtures sit on the codec's fixed points (see _MM_JPEG_SQL comment)
    so the lossy pipeline is bit-exact; any Huffman/dequant/IDCT/color
    conversion error fails the hash.  A decoded frame with R!=G or
    G!=B poisons the sums (-1) so the gray expansion is pinned too."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    sign = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int32)

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
                img = np.zeros((h, w), dtype=np.int32)
                for by in range(h // 8):
                    for bx in range(w // 8):
                        v = 2 * ((did * 37 + bx * 11 + by * 23) % 100) + 28
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            v + 2 * np.tile(sign, (8, 1))
                        )
                a = img.astype(np.uint8)
                if did % 2:  # RGB leg, neutral chroma
                    a = np.repeat(a[:, :, None], 3, axis=2)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_jpeg(a, quant=16),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def featurize(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                w, h, rgb = decode_jpeg(bytes(r.content))
                ok = np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and (
                    np.array_equal(rgb[:, :, 1], rgb[:, :, 2])
                )
                ch = rgb[:, :, 0].astype(np.int64)
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": int(w),
                        "height": int(h),
                        "sum_all": int(ch.sum()) if ok else -1,
                        "sum_col0": int(ch[:, 0::8].sum()) if ok else -1,
                        "sum_col1": int(ch[:, 1::8].sum()) if ok else -1,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height",
                    "sum_all", "sum_col0", "sum_col1",
                ],
            )

    # fused synth→decode→featurize (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, featurize),
        "media_id long, width int, height int, sum_all long, "
        "sum_col0 long, sum_col1 long",
    )


# the REAL WAV decode path, oracle-gated (round 9, VERDICT r8 #4):
# stdlib-wave PCM decode + sample-accurate chunk windows, checked as
# per-chunk int16 SAMPLE SUMS — pure integer arithmetic DuckDB replays
# over a generated frame series.  A one-frame boundary error in the
# ms→frame math (floor/ceil) or a byte-order slip changes a sum.
_MM_WAV_SQL = """
WITH d AS (
  SELECT doc_id, 4000 + (doc_id % 3) * 2000 AS rate, 30 + doc_id % 50 AS n
  FROM documents
), dd AS (
  SELECT doc_id, rate, n, (n * 1000 + rate - 1) // rate AS dur FROM d
), ch AS (
  SELECT doc_id, rate, n, dur, s.generate_series AS start_ms
  FROM dd, generate_series(0, 30, 5) AS s
  WHERE s.generate_series < dur
), cb AS (
  SELECT doc_id, rate, n, start_ms,
         start_ms // 5 AS chunk_idx,
         LEAST(start_ms + 8, dur) AS end_ms,
         (start_ms * rate) // 1000 AS f0,
         LEAST((LEAST(start_ms + 8, dur) * rate + 999) // 1000, n) AS f1
  FROM ch
), fr AS (
  SELECT cb.doc_id, cb.chunk_idx, cb.start_ms, cb.end_ms,
         i.generate_series AS i
  FROM cb, generate_series(0, 79) AS i
  WHERE i.generate_series >= cb.f0 AND i.generate_series < cb.f1
)
SELECT doc_id AS media_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(MIN(start_ms) AS BIGINT) AS start_ms,
       CAST(MIN(end_ms) AS BIGINT) AS end_ms,
       CAST(COUNT(*) * 2 AS BIGINT) AS n_bytes,
       CAST(SUM((doc_id * 7 + i * 13) % 4096 - 2048) AS BIGINT) AS sample_sum
FROM fr GROUP BY doc_id, chunk_idx
"""


@q("mm_real_wav_chunks", _MM_WAV_SQL)
def mm_real_wav_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode + sample-accurate chunking, value-checked: each
    document synthesizes a genuine RIFF/WAVE PCM file (stdlib ``wave``
    writer; int16 samples are a pure integer formula of (doc_id,
    frame)), ``chunk_audio`` windows it through the REAL decode path
    (``decode_wav`` — not the ms_per_byte fake), and a second Arrow
    stage folds each chunk's bytes back to an int16 sample sum.  DuckDB
    replays the ceiling-duration window math and the per-frame formula
    directly, so a one-frame floor/ceil boundary slip or byte-order
    error fails the gate.  Rate varies 4000/6000/8000 by doc so the
    ms↔frame conversion is exercised off the trivial 1-frame-per-ms
    axis."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        chunk_audio_kernel,
        encode_wav,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                rate = 4000 + (did % 3) * 2000
                n = 30 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7 + i * 13) % 4096 - 2048).astype("<i2")
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "content": encode_wav(s, rate),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def sums(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = pdf.copy()
            out["n_bytes"] = out["chunk_bytes"].map(len)
            out["sample_sum"] = out["chunk_bytes"].map(
                lambda b: int(
                    np.frombuffer(b, dtype="<i2").astype(np.int64).sum()
                )
            )
            yield out[
                ["media_id", "chunk_idx", "start_ms", "end_ms",
                 "n_bytes", "sample_sum"]
            ]

    # fused synth→decode→chunk→sum (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, chunk_audio_kernel(window_ms=8, hop_ms=5), sums),
        "media_id long, chunk_idx int, start_ms long, end_ms long,"
        " n_bytes long, sample_sum long",
    )


# the REAL FLAC decode path, oracle-gated (round 10): the WAV gate's
# integer sample formula, losslessly compressed — the oracle is the
# SAME window/sum replay, so a single reconstructed sample anywhere in
# the Rice/LPC/stereo pipeline fails the hash.  Per-doc the encoder
# pins a different subframe family (fixed/verbatim/LPC/escape) and a
# small blocksize forces multi-frame streams.
_MM_FLAC_SQL = """
WITH d AS (
  SELECT doc_id, 4000 + (doc_id % 3) * 2000 AS rate, 30 + doc_id % 50 AS n
  FROM documents
), dd AS (
  SELECT doc_id, rate, n, (n * 1000 + rate - 1) // rate AS dur FROM d
), ch AS (
  SELECT doc_id, rate, n, dur, s.generate_series AS start_ms
  FROM dd, generate_series(0, 30, 5) AS s
  WHERE s.generate_series < dur
), cb AS (
  SELECT doc_id, rate, n, start_ms,
         start_ms // 5 AS chunk_idx,
         LEAST(start_ms + 8, dur) AS end_ms,
         (start_ms * rate) // 1000 AS f0,
         LEAST((LEAST(start_ms + 8, dur) * rate + 999) // 1000, n) AS f1
  FROM ch
), fr AS (
  SELECT cb.doc_id, cb.chunk_idx, cb.start_ms, cb.end_ms,
         i.generate_series AS i
  FROM cb, generate_series(0, 79) AS i
  WHERE i.generate_series >= cb.f0 AND i.generate_series < cb.f1
)
SELECT doc_id AS media_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(MIN(start_ms) AS BIGINT) AS start_ms,
       CAST(MIN(end_ms) AS BIGINT) AS end_ms,
       CAST(COUNT(*) * 2 AS BIGINT) AS n_bytes,
       CAST(SUM((doc_id * 7 + i * 13) % 4096 - 2048) AS BIGINT) AS sample_sum
FROM fr GROUP BY doc_id, chunk_idx
"""


@q("mm_real_flac_chunks", _MM_FLAC_SQL)
def mm_real_flac_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode + sample-accurate chunking, value-checked: each
    document synthesizes the SAME int16 signal as the WAV gate but
    encodes it as genuine FLAC (``sources/flac.py`` — frames, Rice
    residuals, CRC-8/16, PCM MD5), varying the subframe family per doc
    (best-fixed / verbatim / order-2 LPC / escape partitions) with an
    8-sample-per-ms-scale blocksize so every stream is multi-frame.
    ``chunk_audio`` windows it through the codec-agnostic REAL path
    (``decode_audio`` dispatches on the fLaC magic), and the oracle is
    the identical integer replay as ``mm_real_wav_chunks`` — FLAC is
    lossless, so ANY reconstruction error (a Rice parameter misread, a
    predictor off-by-one, a CRC slip, a mid-frame boundary error)
    changes a sample sum and fails the gate."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.flac import encode_flac
    from tagminder_spark.sources.multimodal import (
        chunk_audio_kernel,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        forces = [None, "verbatim", "lpc", "escape"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                rate = 4000 + (did % 3) * 2000
                n = 30 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7 + i * 13) % 4096 - 2048).astype("<i2")
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "content": encode_flac(
                            s, rate, blocksize=32,
                            force=forces[did % 4],
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def sums(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = pdf.copy()
            out["n_bytes"] = out["chunk_bytes"].map(len)
            out["sample_sum"] = out["chunk_bytes"].map(
                lambda b: int(
                    np.frombuffer(b, dtype="<i2").astype(np.int64).sum()
                )
            )
            yield out[
                ["media_id", "chunk_idx", "start_ms", "end_ms",
                 "n_bytes", "sample_sum"]
            ]

    # fused synth→decode→chunk→sum (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, chunk_audio_kernel(window_ms=8, hop_ms=5), sums),
        "media_id long, chunk_idx int, start_ms long, end_ms long,"
        " n_bytes long, sample_sum long",
    )


@q("mm_real_aiff_chunks", _MM_WAV_SQL)
def mm_real_aiff_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AIFF / AIFF-C decode + sample-accurate chunking,
    value-checked (round 13, VERDICT r12 #4): each document
    synthesizes the SAME int16 signal as the WAV gate but encodes it
    as genuine AIFF — cycling classic big-endian ``AIFF``, AIFF-C
    ``twos`` (big) and AIFF-C ``sowt`` (little) per doc so BOTH byte
    orders and both container flavors run through ``chunk_audio``'s
    codec-agnostic real path (``decode_audio`` dispatches on the FORM
    magic).  The oracle is the identical integer replay as
    ``mm_real_wav_chunks`` — AIFF PCM is lossless, so an endianness
    slip, an SSND offset misread, or a frame-boundary error changes a
    sample sum and fails the gate.  Reference ingests ``.aiff``
    (scripts/ingest/tags2db.py:108)."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        chunk_audio_kernel,
        encode_aiff,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    comps = [b"NONE", b"twos", b"sowt"]

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                rate = 4000 + (did % 3) * 2000
                n = 30 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7 + i * 13) % 4096 - 2048).astype(np.int16)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "content": encode_aiff(
                            s, rate, compression=comps[did % 3]
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def sums(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = pdf.copy()
            # decode_aiff hands chunk bytes back in the CONTAINER's
            # byte order: '>i2' for NONE/twos docs, '<i2' for sowt
            out["n_bytes"] = out["chunk_bytes"].map(len)
            out["sample_sum"] = [
                int(np.frombuffer(
                    b, dtype="<i2" if mid % 3 == 2 else ">i2"
                ).astype(np.int64).sum())
                for b, mid in zip(out["chunk_bytes"], out["media_id"])
            ]
            yield out[
                ["media_id", "chunk_idx", "start_ms", "end_ms",
                 "n_bytes", "sample_sum"]
            ]

    # fused synth→decode→chunk→sum (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, chunk_audio_kernel(window_ms=8, hop_ms=5), sums),
        "media_id long, chunk_idx int, start_ms long, end_ms long,"
        " n_bytes long, sample_sum long",
    )


# same integer replay as _MM_WAV_SQL, but the rate set must come from
# WavPack's fixed sample-rate table (no 4000): 6000/8000/12000
_MM_WV_SQL = _MM_WAV_SQL.replace(
    "4000 + (doc_id % 3) * 2000",
    "CASE (doc_id % 3) WHEN 0 THEN 6000 WHEN 1 THEN 8000"
    " ELSE 12000 END",
)


@q("mm_real_wv_chunks", _MM_WV_SQL)
def mm_real_wv_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WavPack decode + sample-accurate chunking, value-checked
    (round 13, VERDICT r12 #5): each document synthesizes the SAME
    int16 signal as the WAV gate but encodes it as a genuine
    multi-block WavPack stream (``sources/wavpack.py`` — adaptive
    decorrelation chain incl. the stereo... here mono cross-free
    path, joint-free mono blocks, the median-driven words entropy
    coder with zero-run and holding-phase machinery, per-block CRC),
    with the block size small enough that every stream is
    multi-block.  ``chunk_audio`` windows it through the
    codec-agnostic real path (``decode_audio`` dispatches on the
    wvpk magic), and the oracle is the identical integer replay as
    ``mm_real_wav_chunks`` — WavPack is lossless, so ANY
    reconstruction error (a median walk slip, a weight update sign
    error, a holding-phase desync, a block seam off-by-one) changes
    a sample sum and fails the gate.  Reference ingests ``.wv``
    (scripts/ingest/tags2db.py:108)."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        chunk_audio_kernel,
    )
    from tagminder_spark.sources.wavpack import encode_wavpack

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                rate = (6000, 8000, 12000)[did % 3]
                n = 30 + did % 50
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7 + i * 13) % 4096 - 2048).astype(np.int16)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "content": encode_wavpack(
                            s, rate, block_samples=32
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def sums(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = pdf.copy()
            out["n_bytes"] = out["chunk_bytes"].map(len)
            out["sample_sum"] = out["chunk_bytes"].map(
                lambda b: int(
                    np.frombuffer(b, dtype="<i2").astype(np.int64).sum()
                )
            )
            yield out[
                ["media_id", "chunk_idx", "start_ms", "end_ms",
                 "n_bytes", "sample_sum"]
            ]

    # fused synth→decode→chunk→sum (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, chunk_audio_kernel(window_ms=8, hop_ms=5), sums),
        "media_id long, chunk_idx int, start_ms long, end_ms long,"
        " n_bytes long, sample_sum long",
    )


# the REAL GIF decode path, oracle-gated (round 10): palettized
# analytic pixels through genuine LZW (interlaced for odd docs), with
# a POSITION-WEIGHTED checksum — plain channel sums are permutation-
# invariant, so a broken interlace row reorder would slip through
# them; the weighted sum pins every pixel to its (x, y).
_MM_GIF_SQL = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
         (doc_id * 131) % 256 AS base
  FROM documents
), grid AS (
  SELECT d.doc_id, d.w, d.h, d.base, x.generate_series AS x,
         y.generate_series AS y,
         ((x.generate_series * 7 + y.generate_series * 13 + d.base)
          % 64) * 4 AS r
  FROM d, generate_series(0, 16) AS x, generate_series(0, 13) AS y
  WHERE x.generate_series < d.w AND y.generate_series < d.h
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(255 - r) AS BIGINT) AS sum_g,
       CAST(SUM(r // 2) AS BIGINT) AS sum_b,
       CAST(SUM(r * (x + w * y)) AS BIGINT) AS wsum_r
FROM grid GROUP BY doc_id
"""


@q("mm_real_gif_features", _MM_GIF_SQL)
def mm_real_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, value-checked: each document synthesizes a
    genuine GIF89a (palette built from the analytic pixel formula,
    real variable-width LZW, INTERLACED for odd doc_ids) and the
    generic image path (``_decode_image_real`` dispatching on the GIF
    magic) reconstructs the pixels.  DuckDB replays the formula — the
    per-channel sums catch any palette/LZW error and the
    position-weighted ``wsum_r`` catches a row-order (interlace)
    error that permutation-invariant sums cannot."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.gif import encode_gif
    from tagminder_spark.sources.multimodal import _decode_image_real

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r_ in pdf.itertuples():
                did = int(r_.media_id)
                w = 4 + did % 13
                h = 3 + did % 11
                base = (did * 131) % 256
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                red = (((x * 7 + y * 13 + base) % 64) * 4).astype(
                    np.uint8
                ) + np.zeros((h, w), np.uint8)
                img = np.stack(
                    [red, 255 - red, red // 2], axis=-1
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_gif(
                            img, interlace=bool(did % 2)
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def feats(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = []
            for r_ in pdf.itertuples():
                w, h, rgb = _decode_image_real(bytes(r_.content))
                pos = (
                    np.arange(w)[None, :] + w * np.arange(h)[:, None]
                ).astype(np.int64)
                out.append(
                    {
                        "media_id": r_.media_id,
                        "width": int(w),
                        "height": int(h),
                        "sum_r": int(rgb[:, :, 0].astype(np.int64).sum()),
                        "sum_g": int(rgb[:, :, 1].astype(np.int64).sum()),
                        "sum_b": int(rgb[:, :, 2].astype(np.int64).sum()),
                        "wsum_r": int(
                            (rgb[:, :, 0].astype(np.int64) * pos).sum()
                        ),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "sum_r",
                         "sum_g", "sum_b", "wsum_r"],
            )

    # fused synth→decode→featurize (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, feats),
        "media_id long, width int, height int, sum_r long, sum_g long,"
        " sum_b long, wsum_r long",
    )


# the REAL MP4 sample-table path, oracle-gated (round 10): each doc
# muxes a spec-valid MP4 (multi-chunk stsc, per-sample stsz, stss sync
# marks) whose sample payloads are an md5 formula; frame-sampling
# resolves the table structurally and slices exact codec bytes out of
# mdat, and DuckDB replays both the tick→sample selection (uniform
# 100 ms deltas, 250 ms ticks) and the payload bytes.  A one-byte
# offset error anywhere in stts/stsc/stco resolution changes a frame's
# base64 and fails the gate.
_MM_MP4_SQL = """
WITH d AS (SELECT doc_id, 3 + doc_id % 7 AS n FROM documents),
f AS (
  SELECT doc_id, n, s.generate_series AS i
  FROM d, generate_series(0, 10) AS s
  WHERE s.generate_series * 250 <= (n - 1) * 100
), sel AS (
  SELECT doc_id, i, (i * 5) // 2 AS j FROM f
)
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(16 * (1 + j % 3) AS BIGINT) AS n_bytes,
       to_base64(repeat(unhex(md5(doc_id || ':' || j)), 1 + j % 3))
         AS frame_b64
FROM sel
"""


@q("mm_real_mp4_frames", _MM_MP4_SQL)
def mm_real_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 frame-sampling, value-checked end to end: each document
    muxes a genuine ISO-BMFF file (``sources/mp4.py`` fixture muxer —
    ftyp + mdat + full moov sample table; chunks of 2 and 3 samples so
    stsc/stco resolution is non-trivial), ``sample_video_frames``
    resolves the sample table STRUCTURALLY (no codec) and emits the
    exact mdat byte range of the last sample at-or-before each 250 ms
    tick, and the oracle replays the tick→sample math and the payload
    formula.  Codec decode of the extracted bytes remains the
    documented pyav seam — at 100 TB the sample table IS the plan
    (which byte ranges to fetch); this gate pins that plan exactly."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as pd

    from tagminder_spark.sources.mp4 import make_mp4
    from tagminder_spark.sources.multimodal import (
        FRAME_SAMPLE_SCHEMA,
        sample_video_frames_kernel,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                n = 3 + did % 7
                payloads = [
                    _hl.md5(f"{did}:{j}".encode()).digest() * (1 + j % 3)
                    for j in range(n)
                ]
                rows.append(
                    {
                        "media_id": did,
                        "kind": "video",
                        "content": make_mp4(
                            payloads, fps=10, timescale=1000,
                            chunk_sizes=(2, 3),
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    # fused synth→sample-table walk (guide §4; see session.fuse_pandas)
    frames = spread(d).mapInPandas(
        fuse_pandas(synth, sample_video_frames_kernel(every_ms=250)),
        FRAME_SAMPLE_SCHEMA,
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame_png").cast("long").alias("n_bytes"),
        F.base64("frame_png").alias("frame_b64"),
    )


# resize twin: fake dims = 64 + (md5 bytes 0/1) % 192, payload =
# md5(content || '224x224') digest (md5 over UTF-8 text == md5 over the
# encoded binary content)
_MM_RESIZE_SQL = """
SELECT doc_id AS media_id,
       CAST(64 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 192 AS INT)
         AS width,
       CAST(64 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 192 AS INT)
         AS height,
       CAST(224 AS INT) AS target_w,
       CAST(224 AS INT) AS target_h,
       to_base64(unhex(md5(text || '224x224'))) AS resized_b64
FROM documents
"""


@q("mm_image_resize", _MM_RESIZE_SQL)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (the pre-training normalization step),
    value-checked end to end: the mapInPandas kernel's deterministic
    fake (source dims from the content hash, payload md5(content ||
    target)) is replayed exactly in SQL, pinning schema, Arrow batch
    shape, and payload bytes; Pillow LANCZOS swaps in behind the same
    signature on a real image."""
    from tagminder_spark.sources.multimodal import resize_images

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    out = resize_images(media, target_w=224, target_h=224)
    return out.select(
        "media_id",
        "width",
        "height",
        "target_w",
        "target_h",
        F.regexp_replace(F.base64("resized"), r"[\r\n]", "").alias(
            "resized_b64"
        ),
    )


# audio chunking twin: duration = octet_length*10ms, windows of 1000ms
# advanced by 500ms, chunk bytes = proportional byte range (ceil end)
_MM_AUDIO_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, encode(text) AS content,
         octet_length(encode(text)) * 10 AS dur
  FROM documents
),
idx AS (
  SELECT media_id, hex(content) AS hx, dur,
         unnest(range(0, CAST(ceil(dur / 500.0) AS BIGINT))) AS i
  FROM m WHERE dur > 0
)
-- DuckDB has no BLOB substring; slice the hex encoding (2 chars/byte)
SELECT media_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * 500 AS BIGINT) AS start_ms,
       CAST(LEAST(i * 500 + 1000, dur) AS BIGINT) AS end_ms,
       to_base64(unhex(substr(hx, CAST(i * 100 + 1 AS INT),
           (CAST(ceil(LEAST(i * 500 + 1000, dur) / 10.0) AS INT)
             - CAST(i * 50 AS INT)) * 2))) AS chunk_b64
FROM idx
"""


@q("mm_audio_chunks", _MM_AUDIO_SQL)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plumbing, value-checked end to end: documents'
    text bytes stand in for the opaque audio content, the mapInPandas
    kernel (sources/multimodal.py chunk_audio) fans each media row out
    into overlapping 1000 ms windows at 500 ms hop, and the
    deterministic fake codec (10 ms/byte, proportional byte ranges)
    lets the oracle replay the exact chunk boundaries AND bytes
    (base64) in SQL — binary column, Arrow batch shape, 1->N fan-out,
    and byte slicing all carry real data."""
    from tagminder_spark.sources.multimodal import chunk_audio

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    chunks = chunk_audio(media, window_ms=1000, hop_ms=500, ms_per_byte=10)
    return chunks.select(
        "media_id",
        "chunk_idx",
        "start_ms",
        "end_ms",
        # Spark's base64 is MIME-chunked (CRLF every 76 chars); strip to
        # the unchunked standard encoding DuckDB's to_base64 emits
        F.regexp_replace(F.base64("chunk_bytes"), r"[\r\n]", "").alias(
            "chunk_b64"
        ),
    )


# video frame-sampling twin: duration = (n_chars%7+1) seconds, one
# pseudo-frame per second, frame bytes = md5 digest of "media_id:i"
_MM_VIDEO_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, n_chars % 7 + 1 AS n_frames FROM documents
),
f AS (
  SELECT media_id, unnest(range(0, n_frames)) AS i FROM m
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       to_base64(unhex(md5(CAST(media_id AS VARCHAR) || ':'
           || CAST(i AS VARCHAR)))) AS frame_b64
FROM f
"""


@q("mm_video_frames", _MM_VIDEO_SQL)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing, value-checked end to end: media
    rows with a duration_ms meta entry fan out into one pseudo-frame
    per second via the mapInPandas kernel (sources/multimodal.py
    sample_video_frames); the deterministic fake frame (md5 digest of
    media_id:idx) lets the oracle replay the exact fan-out AND payload
    bytes in SQL. Real decode swaps in ffmpeg/pyav behind the same
    signature."""
    from tagminder_spark.sources.multimodal import sample_video_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.create_map(
            F.lit("duration_ms"),
            ((F.col("n_chars") % 7 + 1) * 1000).cast("long"),
        ).alias("meta"),
    )
    frames = sample_video_frames(media, every_ms=1000)
    return frames.select(
        "media_id",
        "frame_idx",
        F.regexp_replace(F.base64("frame_png"), r"[\r\n]", "").alias(
            "frame_b64"
        ),
    )


_STRUCT_SQL = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words,
       CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                            s -> trim(s) <> '')) AS INT) AS n_sentences,
       CAST(len(list_filter(string_split(text, chr(10) || chr(10)),
                            s -> trim(s) <> '')) AS INT) AS n_paragraphs,
       ROUND(CAST(length(text) AS DOUBLE) /
             GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                      s -> trim(s) <> '')), 1), 6)
         AS chars_per_sentence
FROM documents
"""


@q("t_doc_structure", _STRUCT_SQL)
def t_doc_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document structure stats for corpus curation: word, sentence, and
    paragraph counts plus chars-per-sentence — pure expressions, zero
    shuffle, one scan (the same single-pass shape as t_quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    sentences = F.filter(
        F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s) != ""
    )
    paragraphs = F.filter(
        F.split(F.col("text"), r"\n\n"), lambda s: F.trim(s) != ""
    )
    n_sent = F.size(sentences)
    return d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).cast("int").alias("n_words"),
        n_sent.cast("int").alias("n_sentences"),
        F.size(paragraphs).cast("int").alias("n_paragraphs"),
        F.round(
            F.length("text").cast("double") / F.greatest(n_sent, F.lit(1)), 6
        ).alias("chars_per_sentence"),
    )


_NFC_SQL = """
SELECT doc_id,
       md5(nfc_normalize(text)) AS nfc_md5,
       CAST(length(nfc_normalize(text)) AS INT) AS nfc_len,
       CAST(nfc_normalize(text) = text AS INT) AS already_nfc
FROM documents
"""


@q("t_nfc_normalize", _NFC_SQL)
def t_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization — the text-normalization pass every
    multi-source corpus needs before hashing/dedup (combining marks vs
    precomposed forms hash differently). Spark has no NFC built-in, so
    this is the honest Arrow-batched pandas-UDF path (unicodedata.NFC);
    the oracle replays it with DuckDB's nfc_normalize, value-checking
    the UDF end to end via md5/length/identity columns."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies hints and
    # pandas_udf evals them in the module globals, where pandas isn't
    # imported — annotate explicitly instead.
    def _nfc_impl(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc_impl.__annotations__ = {"s": pd.Series, "return": pd.Series}
    nfc = pandas_udf(_nfc_impl, "string")

    d = load_table(spark, sf_dir, "documents")
    n = nfc(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(n).alias("nfc_md5"),
        F.length(n).cast("int").alias("nfc_len"),
        (n == F.col("text")).cast("int").alias("already_nfc"),
    )


# MP3 stream layer (round 11, VERDICT r10 #4): the frame table +
# side-info + scalefactor + BIT-RESERVOIR machinery of MPEG-1 Layer
# III, value-checked end to end.  The oracle independently replays the
# frame-length arithmetic (144000*br // 44100 + padding), cumulative
# byte offsets, 1152-sample timing, the ISO slen table, and the chosen
# per-band scalefactor values — so a parser that mis-walks frames,
# mis-reads a side-info field, or resolves the reservoir off by even
# one bit changes a sum and fails the hash.  Spectral (Huffman/IMDCT)
# decode stays the documented seam: those are spec-TABULATED constants
# (Annex B.7 code tables, B.3 synthesis window) with no copy in this
# container — unlike JPEG (tables in-file) or FLAC/GIF (algorithmic),
# they cannot be re-derived, and a decoder on guessed tables would
# self-roundtrip yet mis-decode every real file.
_MM_MP3_SQL = """
WITH d AS (SELECT doc_id, 4 + doc_id % 4 AS nfr FROM documents),
fr AS (
  SELECT doc_id, s.generate_series AS fr
  FROM d, generate_series(0, 7) AS s
  WHERE s.generate_series < nfr
), fl AS (
  SELECT doc_id, fr,
         (144000 * (CASE (doc_id + fr) % 4 WHEN 0 THEN 96 WHEN 1 THEN 112
                    WHEN 2 THEN 128 ELSE 160 END)) // 44100
           + (doc_id + fr) % 2 AS flen,
         (fr * 1152000) // 44100 AS ts_ms,
         CASE WHEN fr = 0 THEN 0
              ELSE (doc_id * 13 + fr * 29) % 120 END AS mdb
  FROM fr
), fo AS (
  SELECT doc_id, fr, flen, ts_ms, mdb,
         COALESCE(SUM(flen) OVER (
             PARTITION BY doc_id ORDER BY fr
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM fl
), sc AS (
  SELECT fo.*, g.generate_series AS gr, c.generate_series AS ch,
         (doc_id + fr + g.generate_series + c.generate_series) % 16
           AS scomp,
         (doc_id * 5 + fr * 7 + g.generate_series * 11
          + c.generate_series * 13) % 256 AS gg,
         CASE WHEN (doc_id + fr) % 3 = 2 THEN 1 ELSE 0 END AS short_blk
  FROM fo, generate_series(0, 1) AS g, generate_series(0, 1) AS c
), sl AS (
  SELECT sc.*,
         ([0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4])[scomp + 1] AS s1,
         ([0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3])[scomp + 1] AS s2,
         CASE WHEN short_blk = 1 THEN 36 ELSE 21 END AS nbands,
         CASE WHEN short_blk = 1 THEN 18 ELSE 11 END AS cut1
  FROM sc
), vals AS (
  SELECT sl.*, b.generate_series AS band,
         CASE WHEN (CASE WHEN b.generate_series < cut1
                    THEN s1 ELSE s2 END) = 0
              THEN 0
              ELSE (doc_id * 3 + fr * 5 + gr * 7 + ch * 11
                    + b.generate_series)
                   % (1 << (CASE WHEN b.generate_series < cut1
                            THEN s1 ELSE s2 END))
         END AS v
  FROM sl, generate_series(0, 35) AS b
  WHERE b.generate_series < nbands
)
SELECT doc_id AS media_id,
       CAST(fr AS INT) AS frame,
       CAST(gr AS INT) AS granule,
       CAST(ch AS INT) AS channel,
       CAST(MIN(off) AS BIGINT) AS offset,
       CAST(MIN(flen) AS BIGINT) AS frame_len,
       CAST(MIN(ts_ms) AS BIGINT) AS ts_ms,
       CAST(MIN(mdb) AS INT) AS main_data_begin,
       CAST(MIN(gg) AS INT) AS global_gain,
       CAST(SUM(v) AS BIGINT) AS scalefac_sum,
       CAST(SUM((band + 1) * v) AS BIGINT) AS scalefac_wsum
FROM vals
GROUP BY doc_id, fr, gr, ch
"""


@q("mm_real_mp3_frames", _MM_MP3_SQL)
def mm_real_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3 stream-layer decode, value-checked: each document
    builds a genuine MPEG-1 Layer III stream (``sources/mp3.py``
    encoder twin — real headers with per-frame bitrate/padding so the
    walk is VBR, real side info, scalefactors written into the shared
    main-data stream at the exact position ``main_data_begin``
    implies, reservoir reaching back into earlier frames' ancillary
    bytes), and ``granule_report`` must invert it all from the bits:
    frame table (offsets/lengths/timing), side-info fields, and the
    scalefactors recovered THROUGH the bit reservoir.  At 100 TB this
    layer is the split plan: frame-aligned byte ranges plus the
    ≤511-byte reservoir look-back a distributed chunker must carry."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from tagminder_spark.sources.mp3 import SLEN, build_mp3_stream
    from tagminder_spark.sources.mp3 import granule_report as _grep

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        bitrates = [96, 112, 128, 160]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                nfr = 4 + did % 4
                frames = []
                for fr in range(nfr):
                    short = (did + fr) % 3 == 2
                    nbands, cut1 = (36, 18) if short else (21, 11)
                    grs = []
                    for gr in range(2):
                        chs = []
                        for ch in range(2):
                            scomp = (did + fr + gr + ch) % 16
                            s1, s2 = SLEN[scomp]
                            sfs = [
                                (did * 3 + fr * 5 + gr * 7 + ch * 11
                                 + band)
                                % (1 << (s1 if band < cut1 else s2))
                                if (s1 if band < cut1 else s2) else 0
                                for band in range(nbands)
                            ]
                            g = {
                                "scalefac_compress": scomp,
                                "global_gain": (
                                    did * 5 + fr * 7 + gr * 11 + ch * 13
                                ) % 256,
                                "scalefacs": sfs,
                            }
                            if short:
                                g["block_type"] = 2
                                g["mixed_block_flag"] = 0
                                g["table_select"] = [0, 0]
                                g["subblock_gain"] = [0, 0, 0]
                            else:
                                g["table_select"] = [0, 0, 0]
                                g["region0_count"] = 0
                                g["region1_count"] = 0
                            chs.append(g)
                        grs.append(chs)
                    frames.append({
                        "bitrate": bitrates[(did + fr) % 4],
                        "padding": (did + fr) % 2,
                        "main_data_begin": (
                            0 if fr == 0 else (did * 13 + fr * 29) % 120
                        ),
                        "granules": grs,
                    })
                content = build_mp3_stream(frames)
                for row in _grep(content):
                    rows.append({
                        "media_id": did,
                        "frame": row["frame"],
                        "granule": row["granule"],
                        "channel": row["channel"],
                        "offset": row["offset"],
                        "frame_len": row["frame_len"],
                        "ts_ms": row["ts_ms"],
                        "main_data_begin": row["main_data_begin"],
                        "global_gain": row["global_gain"],
                        "scalefac_sum": row["scalefac_sum"],
                        "scalefac_wsum": row["scalefac_wsum"],
                    })
            yield pd.DataFrame(rows)

    return spread(d).mapInPandas(
        run,
        "media_id long, frame int, granule int, channel int,"
        " offset long, frame_len long, ts_ms long,"
        " main_data_begin int, global_gain int,"
        " scalefac_sum long, scalefac_wsum long",
    )


# 16-bit Adam7-interlaced PNG (round 11): the two PNG variants that
# previously fell to the Pillow seam, decoded for real — seven
# independently filtered passes re-woven through the interlace grid,
# big-endian 16-bit samples reduced to their high byte (the spec's
# 16->8).  The oracle replays the pixel formula and the high-byte
# reduction; a pass mis-weave or a byte-order slip changes a sum.
_MM_PNG16_SQL = """
WITH d AS (
  SELECT doc_id, 9 + doc_id % 12 AS w, 6 + doc_id % 10 AS h
  FROM documents
), grid AS (
  SELECT d.doc_id, d.w, d.h, x.generate_series AS x, y.generate_series AS y
  FROM d, generate_series(0, 20) AS x, generate_series(0, 15) AS y
  WHERE x.generate_series < d.w AND y.generate_series < d.h
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(((x * 9973 + y * 131 + doc_id * 257) % 65536) // 256)
            AS BIGINT) AS sum_r,
       CAST(SUM(((x * 257 + y * 7919 + doc_id * 101) % 65536) // 256)
            AS BIGINT) AS sum_g,
       CAST(SUM(((x * y * 31 + doc_id * 11) % 65536) // 256)
            AS BIGINT) AS sum_b
FROM grid GROUP BY doc_id
"""


@q("mm_real_png16_features", _MM_PNG16_SQL)
def mm_real_png16_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 16-bit Adam7-interlaced PNG decode, value-checked: each
    document synthesizes a VALID interlaced 16-bit RGB PNG (seven
    Adam7 passes, each independently zlib-deflated scanlines with the
    filter type cycling across the concatenated pass rows), the
    stdlib-zlib decoder re-weaves the passes and reduces 16-bit
    samples to their high byte, and the featurizer's channel means
    convert to exact integer sums the oracle replays in closed form.
    Closes the round-10 codec-seam item for PNG: both remaining
    variants (16-bit depth, interlacing) are algorithmic — filters +
    grid arithmetic — so unlike MP3's tabulated spec constants they
    CAN be re-derived exactly."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.multimodal import (
        IMAGE_FEATURES_SCHEMA,
        encode_png,
        image_features_kernel,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                w, h = 9 + did % 12, 6 + did % 10
                y, x = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (x * 9973 + y * 131 + did * 257) % 65536,
                        (x * 257 + y * 7919 + did * 101) % 65536,
                        (x * y * 31 + did * 11) % 65536,
                    ],
                    axis=-1,
                ).astype(np.uint16)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_png(
                            arr, filters="cycle", depth=16,
                            interlace=True,
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    # fused synth→decode→featurize: one Python worker per task, the
    # container bytes never cross the Arrow boundary (guide §4; see
    # session.fuse_pandas)
    feats = spread(d).mapInPandas(
        fuse_pandas(synth, image_features_kernel(dim=9)),
        IMAGE_FEATURES_SCHEMA,
    )
    px = F.col("width") * F.col("height")
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * 255 * px)
        .cast("long")
        .alias("sum_r"),
        F.round(F.element_at("feature", 5) * 255 * px)
        .cast("long")
        .alias("sum_g"),
        F.round(F.element_at("feature", 9) * 255 * px)
        .cast("long")
        .alias("sum_b"),
    )


# Progressive JPEG (round 11): the SOF2 half of the JPEG seam, closed —
# same analytic fixed-point oracle as the baseline gate, but the
# fixtures now ride a six-scan progressive script (DC first interleaved
# -> per-component AC first with EOB runs -> DC refinement bits ->
# per-component AC refinement with interleaved correction bits), so a
# successive-approximation slip anywhere changes a pixel sum.
_MM_JPEG_PROG_SQL = """
WITH d AS (
  SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
  FROM documents
), blocks AS (
  SELECT d.doc_id, d.w, d.h,
         bx.generate_series AS bx, by.generate_series AS by,
         2 * ((d.doc_id * 37 + bx.generate_series * 11
               + by.generate_series * 23) % 100) + 28 AS v
  FROM d, generate_series(0, 2) AS bx, generate_series(0, 1) AS by
  WHERE bx.generate_series < d.w // 8 AND by.generate_series < d.h // 8
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(64 * v) AS BIGINT) AS sum_all,
       CAST(SUM(8 * (v + 2)) AS BIGINT) AS sum_col0,
       CAST(SUM(8 * (v - 2)) AS BIGINT) AS sum_col1
FROM blocks GROUP BY doc_id
"""


@q("mm_real_jpeg_prog_features", _MM_JPEG_PROG_SQL)
def mm_real_jpeg_prog_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode (round 11 — SOF2 closed; it is
    ALGORITHMIC, the Huffman tables ride in the file, so unlike MP3's
    tabulated constants it can be re-derived exactly): the baseline
    gate's fixed-point fixtures encoded through the six-scan
    progressive script — spectral selection + successive approximation
    (DC/AC first + refinement scans, EOB runs spanning blocks,
    refinement correction bits interleaved exactly where the decoder's
    walk reads them).  Successive approximation is exact at the
    coefficient level, so the oracle's analytic pixel sums (whole
    image + the x%8 in {0,1} column families pinning the cosine
    pattern's signs) must match bit-for-bit; gray and neutral-chroma
    RGB legs alternate by doc parity as in the baseline gate."""
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd

    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    sign = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int32)

    def synth(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
                img = np.zeros((h, w), dtype=np.int32)
                for by in range(h // 8):
                    for bx in range(w // 8):
                        v = 2 * ((did * 37 + bx * 11 + by * 23) % 100) + 28
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            v + 2 * np.tile(sign, (8, 1))
                        )
                a = img.astype(np.uint8)
                if did % 2:  # RGB leg, neutral chroma
                    a = np.repeat(a[:, :, None], 3, axis=2)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "content": encode_jpeg(
                            a, quant=16, progressive=True
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    def featurize(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                w, h, rgb = decode_jpeg(bytes(r.content))
                ok = np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and (
                    np.array_equal(rgb[:, :, 1], rgb[:, :, 2])
                )
                ch = rgb[:, :, 0].astype(np.int64)
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": int(w),
                        "height": int(h),
                        "sum_all": int(ch.sum()) if ok else -1,
                        "sum_col0": int(ch[:, 0::8].sum()) if ok else -1,
                        "sum_col1": int(ch[:, 1::8].sum()) if ok else -1,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height",
                    "sum_all", "sum_col0", "sum_col1",
                ],
            )

    # fused synth→decode→featurize (guide §4; see session.fuse_pandas)
    return spread(d).mapInPandas(
        fuse_pandas(synth, featurize),
        "media_id long, width int, height int,"
        " sum_all long, sum_col0 long, sum_col1 long",
    )


# REAL Ogg/Vorbis decode (round 12, VERDICT r11 #3): each document
# builds a genuine Ogg Vorbis stream (sources/vorbis.py encoder twin —
# CRC-correct pages, real setup header with in-stream codebooks, §3.2.1
# codeword assignment, floor1 + residue-type-2 payloads), and
# vorbis_packet_report must invert the whole stack from the bits:
# page/granule walk, mode flags, raw floor1 Y values decoded through
# the floor codebook, and every residue codebook entry recovered
# through the §8.6.2 partition walk (classwords base-decomposed, value
# books selected by decoded class).  The oracle replays the payload
# arithmetic.  The FLOAT synthesis half (floor curve × residue → IMDCT
# → lapped PCM) is pytest-pinned by perfect-reconstruction tests
# (tests/test_vorbis.py) — floats have no SQL twin, integers do.
_MM_VORBIS_SQL = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 3 AS npkt FROM documents
), pk AS (
  SELECT doc_id, p.generate_series AS k,
         CASE WHEN (doc_id + p.generate_series) % 4 = 3
              THEN 1 ELSE 0 END AS mode,
         CASE WHEN (doc_id + p.generate_series) % 4 = 3
              THEN 2048 ELSE 256 END AS bs
  FROM d, generate_series(0, 4) AS p
  WHERE p.generate_series < npkt
), st AS (
  SELECT doc_id, k, mode, bs,
         COALESCE((LAG(bs) OVER (PARTITION BY doc_id ORDER BY k)
                   + bs) // 4, 0) AS step
  FROM pk
), gr AS (
  SELECT doc_id, k, mode, bs,
         SUM(step) OVER (PARTITION BY doc_id ORDER BY k) AS granule
  FROM st
), fy AS (
  SELECT doc_id, k,
         SUM((doc_id * 7 + k * 5 + i.generate_series * 3) % 64) AS ysum,
         SUM((i.generate_series + 1)
             * ((doc_id * 7 + k * 5 + i.generate_series * 3) % 64))
           AS ywsum
  FROM pk, generate_series(0, 4) AS i
  GROUP BY doc_id, k
), cls AS (
  SELECT doc_id, k,
         SUM((doc_id + k + c.generate_series) % 4) AS csum
  FROM pk, generate_series(0, 3) AS c
  GROUP BY doc_id, k
), vals AS (
  SELECT doc_id, k,
         SUM((doc_id * 3 + k * 11 + cw.generate_series * 8
              + j.generate_series) % 16) AS vsum,
         SUM((cw.generate_series * 8 + j.generate_series + 1)
             * ((doc_id * 3 + k * 11 + cw.generate_series * 8
                 + j.generate_series) % 16)) AS vwsum
  FROM pk, generate_series(0, 3) AS cw, generate_series(0, 7) AS j
  GROUP BY doc_id, k
)
SELECT fy.doc_id AS media_id,
       CAST(fy.k AS INT) AS packet,
       CAST(gr.mode AS INT) AS mode,
       CAST(gr.granule AS BIGINT) AS granule,
       CAST(gr.bs AS INT) AS blocksize,
       CAST(fy.ysum AS BIGINT) AS floor_y_sum,
       CAST(fy.ywsum AS BIGINT) AS floor_y_wsum,
       CAST(cls.csum AS BIGINT) AS class_sum,
       CAST(vals.vsum AS BIGINT) AS value_sum,
       CAST(vals.vwsum AS BIGINT) AS value_wsum
FROM fy
JOIN gr ON gr.doc_id = fy.doc_id AND gr.k = fy.k
JOIN cls ON cls.doc_id = fy.doc_id AND cls.k = fy.k
JOIN vals ON vals.doc_id = fy.doc_id AND vals.k = fy.k
"""


@q("mm_real_vorbis_packets", _MM_VORBIS_SQL)
def mm_real_vorbis_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Ogg/Vorbis stream decode, value-checked end to end at the
    integer layer; float synthesis pinned separately by the TDAC
    perfect-reconstruction pytests.  At 100 TB the Ogg page walk is
    the split plan: capture pattern + CRC per page, so a distributed
    chunker resyncs mid-stream exactly like the MP3 frame walk."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from tagminder_spark.sources.vorbis import (
        Codebook,
        build_vorbis_stream,
        vorbis_packet_report,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        books = [
            Codebook(1, [6] * 64),
            Codebook(2, [2] * 4),
            Codebook(4, [4] * 16, lookup_type=1, minimum=0.0,
                     delta=1.0, value_bits=1, multiplicands=[0, 1]),
            Codebook(4, [4] * 16, lookup_type=1, minimum=-1.0,
                     delta=1.0, value_bits=1, multiplicands=[0, 1]),
        ]
        setup = {
            "channels": 1,
            "codebooks": books,
            "floors": [{
                "type": 1, "partitions": 1, "class_list": [0],
                "classes": [{"dims": 3, "subclass_bits": 0,
                             "masterbook": None, "books": [0]}],
                "multiplier": 4, "rangebits": 6,
                "X": [0, 64, 16, 32, 48],
            }],
            "residues": [{
                "type": 2, "begin": 0, "end": 128,
                "partition_size": 16, "classifications": 2,
                "classbook": 1, "cascades": [1, 1],
                "books": [[2, -1, -1, -1, -1, -1, -1, -1],
                          [3, -1, -1, -1, -1, -1, -1, -1]],
            }],
            "mappings": [{"coupling": [], "mux": [0],
                          "submap_floor": [0],
                          "submap_residue": [0]}],
            # mode 1 = long blocks (2048): every (did+k)%4==3 packet
            # exercises window transitions AND the (n_prev+n_cur)/4
            # granule arithmetic the oracle replays as a window SUM
            "modes": [{"blockflag": 0, "mapping": 0},
                      {"blockflag": 1, "mapping": 0}],
        }
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                npkt = 3 + did % 3
                specs = []
                for k in range(npkt):
                    fy = [(did * 7 + k * 5 + i * 3) % 64
                          for i in range(5)]
                    queue = []
                    for cw in range(4):
                        queue.append((did + k + cw) % 4)
                        queue.extend([
                            (did * 3 + k * 11 + cw * 8 + j) % 16
                            for j in range(8)
                        ])
                    specs.append({
                        "mode": 1 if (did + k) % 4 == 3 else 0,
                        "floor_y": [fy],
                        "res_entries": [queue],
                    })
                stream = build_vorbis_stream(
                    1, 8000, setup, specs,
                    blocksize0=256, blocksize1=2048,
                    serial=did & 0xFFFF,
                )
                for rep in vorbis_packet_report(stream):
                    ents = rep["res_entries"][0]
                    cwords = ents[0::9]
                    vals = [v for p, v in enumerate(ents)
                            if p % 9 != 0]
                    rows.append({
                        "media_id": did,
                        "packet": rep["packet"],
                        "mode": rep["mode"],
                        "granule": rep["granule"],
                        "blocksize": rep["n"],
                        "floor_y_sum": sum(rep["floor_y"][0]),
                        "floor_y_wsum": sum(
                            (i + 1) * y
                            for i, y in enumerate(rep["floor_y"][0])
                        ),
                        "class_sum": sum(cwords),
                        "value_sum": sum(vals),
                        "value_wsum": sum(
                            (p + 1) * v for p, v in enumerate(vals)
                        ),
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "packet", "mode", "granule", "blocksize",
                "floor_y_sum", "floor_y_wsum", "class_sum",
                "value_sum", "value_wsum",
            ])

    return spread(d).mapInPandas(
        run,
        "media_id long, packet int, mode int, granule long,"
        " blocksize int, floor_y_sum long, floor_y_wsum long,"
        " class_sum long, value_sum long, value_wsum long",
    )


# REAL Opus stream layer (round 12): each document builds a genuine
# Ogg Opus stream (sources/opus.py twin — real TOC bytes, all four
# frame-count codes incl. VBR length coding and 255-chained padding,
# RFC 7845 headers + 48 kHz granule accounting), and
# opus_packet_report must invert it from the bits.  The oracle
# recomputes the RFC 6716 §3.1 TOC arithmetic (config → samples-per-
# frame, the 120 ms frame-count cap) and the granule chain.  The
# SILK/CELT spectral stage stays the documented seam (RFC-tabulated
# probability tables, same argument as MP3 Annex B.7).
_MM_OPUS_SQL = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 3 AS npkt FROM documents
), pk AS (
  SELECT doc_id, p.generate_series AS k,
         (doc_id + p.generate_series * 5) % 32 AS config
  FROM d, generate_series(0, 4) AS p
  WHERE p.generate_series < npkt
), cfg AS (
  SELECT doc_id, k, config,
         CASE WHEN config < 12 THEN
                CASE config % 4 WHEN 0 THEN 480 WHEN 1 THEN 960
                     WHEN 2 THEN 1920 ELSE 2880 END
              WHEN config < 16 THEN
                CASE config % 2 WHEN 0 THEN 480 ELSE 960 END
              ELSE
                CASE config % 4 WHEN 0 THEN 120 WHEN 1 THEN 240
                     WHEN 2 THEN 480 ELSE 960 END END AS spf
  FROM pk
), shape AS (
  SELECT doc_id, k, config, spf,
         1 + (doc_id + k) % LEAST(5760 // spf, 5) AS nframes
  FROM cfg
), lens AS (
  SELECT s.doc_id, s.k,
         SUM(20 + (s.doc_id * 3 + s.k * 7 + f.generate_series * 5) % 40)
           AS flen_sum
  FROM shape s, generate_series(0, 4) AS f
  WHERE f.generate_series < s.nframes
  GROUP BY s.doc_id, s.k
)
SELECT s.doc_id AS media_id,
       CAST(s.k AS INT) AS packet,
       CAST(s.config AS INT) AS config,
       CASE WHEN s.config < 12 THEN 'silk'
            WHEN s.config < 16 THEN 'hybrid' ELSE 'celt' END AS mode,
       CAST((s.doc_id + s.k) % 2 AS INT) AS stereo,
       CAST(s.nframes AS INT) AS nframes,
       CAST(s.spf * s.nframes AS BIGINT) AS samples,
       CAST(l.flen_sum AS BIGINT) AS frame_len_sum,
       CAST(CASE WHEN s.nframes > 1 THEN (s.doc_id + s.k) % 3
                 ELSE 0 END AS INT) AS padding,
       CAST(312 + SUM(s.spf * s.nframes) OVER (
            PARTITION BY s.doc_id ORDER BY s.k) AS BIGINT) AS granule
FROM shape s
JOIN lens l ON l.doc_id = s.doc_id AND l.k = s.k
"""


@q("mm_real_opus_packets", _MM_OPUS_SQL)
def mm_real_opus_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Opus stream-layer decode, value-checked: TOC fields,
    frame-count codes, VBR lengths, padding chains, and RFC 7845
    granule accounting all inverted from the bits.  Same 100 TB split
    plan as the other Ogg gate: CRC'd self-delimiting pages."""
    from collections.abc import Iterator as _It

    import pandas as pd

    from tagminder_spark.sources.opus import (
        build_opus_packet,
        build_opus_stream,
        config_samples,
        opus_packet_report,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.media_id)
                npkt = 2 + did % 3
                pkts = []
                for k in range(npkt):
                    config = (did + k * 5) % 32
                    spf = config_samples(config)
                    nframes = 1 + (did + k) % min(5760 // spf, 5)
                    frames = [
                        bytes(
                            (did + k + f + j) % 256
                            for j in range(
                                20 + (did * 3 + k * 7 + f * 5) % 40
                            )
                        )
                        for f in range(nframes)
                    ]
                    pad = (did + k) % 3 if nframes > 1 else 0
                    pkts.append(build_opus_packet(
                        config, (did + k) % 2, frames, padding=pad,
                    ))
                stream = build_opus_stream(
                    pkts, pre_skip=312, serial=did & 0xFFFF,
                )
                for rep in opus_packet_report(stream):
                    rows.append({
                        "media_id": did,
                        "packet": rep["packet"],
                        "config": rep["config"],
                        "mode": rep["mode"],
                        "stereo": rep["stereo"],
                        "nframes": rep["nframes"],
                        "samples": rep["samples"],
                        "frame_len_sum": sum(rep["frame_lens"]),
                        "padding": rep["padding"],
                        "granule": rep["granule"],
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "packet", "config", "mode", "stereo",
                "nframes", "samples", "frame_len_sum", "padding",
                "granule",
            ])

    return spread(d).mapInPandas(
        run,
        "media_id long, packet int, config int, mode string,"
        " stereo int, nframes int, samples long, frame_len_sum long,"
        " padding int, granule long",
    )
