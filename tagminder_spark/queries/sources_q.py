"""Source-format parity queries (SURVEY §2.1 S14/S15): the MusicBrainz
TSV dump reader (tab-separated, ``\\N`` nulls) and the Wikidata JSON-lines
reader (line-mode JSON + identity filter), each exercised on synthesized
raw lines so the *parsing semantics* — not the I/O — are what the oracle
pins. In production these are plain ``spark.read.option("sep","\\t").csv``
/ ``spark.read.json`` jobs; the driver testdata has no raw dump files, so
the queries parse constructed line columns with the same rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.queries import QueryFn
from tagminder_spark.session import fuse_pandas, load_table, spread

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# S14: MB dump TSV member parse (tab sep, \N nulls)
# --------------------------------------------------------------------------

_S14_SQL = r"""
WITH raw AS (
  SELECT CAST(n_nationkey AS VARCHAR) || chr(9) || n_name || chr(9)
         || CASE WHEN n_nationkey % 3 = 0 THEN '\N' ELSE 'c' || n_regionkey END
           AS line
  FROM nation
), split_ AS (
  SELECT string_split(line, chr(9)) AS f FROM raw
)
SELECT CAST(f[1] AS BIGINT) AS entity_id,
       f[2] AS name,
       CASE WHEN f[3] = '\N' THEN NULL ELSE f[3] END AS comment
FROM split_
"""


@q("s14_tsv_parse", _S14_SQL)
def s14_tsv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 (scripts/mdm/harvest/harvest_mb_works.py:257-475): MB dump
    member tables are tab-separated with literal ``\\N`` for NULL. The
    single-pass tar scan becomes a plain distributed text parse; this
    query pins the field-split + null-token semantics.

    Evidence status (deliberate): local oracle_check only — the
    s14_mb_member_routing window gate exercises the same split/null
    path on all 18 member layouts, so this primitive stays registered
    outside the GATE_WINDOW and rides no suite."""
    n = load_table(spark, sf_dir, "nation")
    raw = n.select(
        F.concat_ws(
            "\t",
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.when(F.col("n_nationkey") % 3 == 0, F.lit(r"\N")).otherwise(
                F.concat(F.lit("c"), F.col("n_regionkey"))
            ),
        ).alias("line")
    )
    f = F.split(F.col("line"), "\t")
    return raw.select(
        F.element_at(f, 1).cast("bigint").alias("entity_id"),
        F.element_at(f, 2).alias("name"),
        F.nullif(F.element_at(f, 3), F.lit(r"\N")).alias("comment"),
    )


# --------------------------------------------------------------------------
# S14 deep form: mbdump member routing + works join graph
# --------------------------------------------------------------------------

# Shared fixture line builders (Spark dialect; _mbr_duck translates).
# Decoys make every guard load-bearing: short rows (width guard),
# \N keys (int guard + drop), \N names (text clean), blank role names.
_T = "chr(9)"
_N = "(chr(92) || 'N')"

_W = "(o_orderkey % 500)"
_MBR_WORK_LINE = (
    f"CASE WHEN {_W} % 19 = 0 THEN 'short'"
    f" WHEN {_W} % 23 = 0 THEN {_N} || {_T} || 'w-x' || {_T} || 'T'"
    f" ELSE CAST({_W} AS STRING) || {_T} || 'w-' || CAST({_W} AS STRING)"
    f" || {_T} || ' Work ' || CAST({_W} AS STRING) || ' '"
    f" || {_T} || CASE WHEN {_W} % 3 = 0 THEN {_N}"
    f"            ELSE CAST({_W} % 7 AS STRING) END"
    f" || {_T} || {_N} END"
)

_A = "(c_custkey % 300)"
_MBR_ARTIST_LINE = (
    f"CAST({_A} AS STRING) || {_T} || 'am-' || CAST({_A} AS STRING) || {_T} ||"
    f" CASE WHEN {_A} % 31 = 0 THEN {_N}"
    f" ELSE 'Artist ' || CAST({_A} AS STRING) END"
)

_L = "(o_orderkey % 40)"
# positions 0=id, 1=link_type, 2..9 filler, 10=ended
_MBR_LINK_LINE = (
    f"CAST({_L} AS STRING) || {_T} || CAST({_L} % 8 AS STRING)"
    + "".join(f" || {_T} || {_N}" for _ in range(8))
    + f" || {_T} || CASE WHEN {_L} % 2 = 1 THEN 't' ELSE '0' END"
)

_LT = "(n_nationkey % 8)"
_MBR_LINKTYPE_LINE = (
    f"CAST({_LT} AS STRING) || {_T} || {_N} || {_T} || '0' || {_T} ||"
    f" 'gid-' || CAST({_LT} AS STRING) || {_T} || 'artist' || {_T} || 'work'"
    f" || {_T} ||"
    f" CASE CAST({_LT} % 6 AS INT) WHEN 0 THEN 'composer' WHEN 1 THEN 'lyricist'"
    f" WHEN 2 THEN 'arranger' WHEN 3 THEN 'orchestrator'"
    f" WHEN 4 THEN 'translator' ELSE '' END"
    f" || {_T} || {_N} || {_T} || 'phrase' || {_T} || 'rphrase'"
)

# positions 0=rowid, 1=link, 2=artist, 3=work
_MBR_LAW_LINE = (
    f"CASE WHEN l_linenumber = 7 THEN 'short'"
    f" ELSE CAST(l_orderkey AS STRING) || {_T}"
    f" || CAST((l_orderkey + l_partkey) % 40 AS STRING) || {_T}"
    f" || CASE WHEN l_suppkey % 29 = 0 THEN {_N}"
    f"    ELSE CAST(l_partkey % 300 AS STRING) END || {_T}"
    f" || CAST(l_orderkey % 500 AS STRING) END"
)


def _mbr_duck(e: str) -> str:
    return e.replace("AS STRING", "AS VARCHAR")


# DuckDB expression for the Python str.strip() character set (shared
# codepoint list with the Spark side — see mbdump.PY_STRIP_CODEPOINTS)
from tagminder_spark.sources.mbdump import PY_STRIP_CODEPOINTS as _WS_CP

_WS = "(" + "||".join(f"chr({i})" for i in _WS_CP) + ")"


def _tr(x: str) -> str:
    return f"trim({x}, {_WS})"


def _cl(x: str) -> str:
    """DuckDB twin of mbdump._clean_text."""
    return (
        f"CASE WHEN {x} IS NULL OR {_tr(x)} = '' OR {_tr(x)} = chr(92)||'N'"
        f" THEN NULL ELSE {_tr(x)} END"
    )


def _ki(x: str) -> str:
    """DuckDB twin of mbdump._to_int."""
    return f"TRY_CAST({_cl(x)} AS BIGINT)"


_S14R_SQL = f"""
WITH work_raw AS (SELECT {_mbr_duck(_MBR_WORK_LINE)} AS value FROM orders),
work_f AS (
  SELECT string_split(value, chr(9)) AS f FROM work_raw
  WHERE len(string_split(value, chr(9))) >= 3
),
work_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS work_id,
         {_cl('f[2]')} AS musicbrainz_workid,
         {_cl('f[3]')} AS work_title,
         {_ki('f[4]')} AS work_type_id
  FROM work_f WHERE {_ki('f[1]')} IS NOT NULL
),
artist_raw AS (SELECT {_mbr_duck(_MBR_ARTIST_LINE)} AS value FROM customer),
artist_f AS (SELECT string_split(value, chr(9)) AS f FROM artist_raw),
artist_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS artist_id, {_cl('f[3]')} AS artist_name
  FROM artist_f WHERE {_ki('f[1]')} IS NOT NULL
),
link_raw AS (SELECT {_mbr_duck(_MBR_LINK_LINE)} AS value FROM orders),
link_f AS (SELECT string_split(value, chr(9)) AS f FROM link_raw),
link_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS link_type_id
  FROM link_f WHERE {_ki('f[1]')} IS NOT NULL
),
lt_raw AS (SELECT {_mbr_duck(_MBR_LINKTYPE_LINE)} AS value FROM nation),
lt_f AS (SELECT string_split(value, chr(9)) AS f FROM lt_raw),
lt_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_type_id, {_cl('f[7]')} AS rel_name
  FROM lt_f WHERE {_ki('f[1]')} IS NOT NULL
),
law_raw AS (SELECT {_mbr_duck(_MBR_LAW_LINE)} AS value FROM lineitem),
law_f AS (
  SELECT string_split(value, chr(9)) AS f FROM law_raw
  WHERE len(string_split(value, chr(9))) >= 4
),
law_t AS (
  SELECT {_ki('f[2]')} AS link_id, {_ki('f[3]')} AS artist_id,
         {_ki('f[4]')} AS work_id
  FROM law_f
  WHERE {_ki('f[2]')} IS NOT NULL AND {_ki('f[3]')} IS NOT NULL
    AND {_ki('f[4]')} IS NOT NULL
),
toks AS (
  SELECT law.work_id, lt.rel_name || ':' || a.artist_name AS tok
  FROM law_t law
  JOIN link_t l USING (link_id)
  JOIN lt_t lt ON lt.link_type_id = l.link_type_id
  JOIN artist_t a USING (artist_id)
  WHERE lt.rel_name IS NOT NULL AND a.artist_name IS NOT NULL
),
agg AS (
  SELECT work_id,
         STRING_AGG(DISTINCT tok, '\\\\' ORDER BY tok) AS role_pairs,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_pairs
  FROM toks GROUP BY work_id
)
SELECT w.work_id, w.work_title, w.work_type_id,
       p.role_pairs, COALESCE(p.n_pairs, 0) AS n_pairs
FROM work_t w LEFT JOIN agg p USING (work_id)
"""


@q("s14_mb_member_routing", _S14R_SQL)
def s14_mb_member_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 deep form (harvest_mb_works.py:257-475): route five mbdump
    member TSVs — work, artist, link, link_type, l_artist_work — through
    the REAL positional parsers (sources/mbdump.parse_member: width
    guard, \\N nulls, int-key drops) and replay the works join graph
    (law→link→link_type role, law→artist name) into per-work sorted
    role:name pairs. Decoy lines make every parser guard load-bearing.
    The three dimension members broadcast; l_artist_work is the fact."""
    from tagminder_spark.functions.core import MV_DELIM  # noqa: PLC0415
    from tagminder_spark.sources.mbdump import parse_member  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")

    work = parse_member(
        o.selectExpr(f"{_MBR_WORK_LINE} AS value"), "work"
    ).select("work_id", "musicbrainz_workid", "work_title", "work_type_id").distinct()
    artist = parse_member(
        c.selectExpr(f"{_MBR_ARTIST_LINE} AS value"), "artist"
    ).select("artist_id", "artist_name").distinct()
    link = parse_member(
        o.selectExpr(f"{_MBR_LINK_LINE} AS value"), "link"
    ).select("link_id", "link_type_id").distinct()
    link_type = parse_member(
        n.selectExpr(f"{_MBR_LINKTYPE_LINE} AS value"), "link_type"
    ).select("link_type_id", "rel_name").distinct()
    law = parse_member(li.selectExpr(f"{_MBR_LAW_LINE} AS value"), "l_artist_work")

    toks = (
        law.join(F.broadcast(link), "link_id")
        .join(F.broadcast(link_type), "link_type_id")
        .join(F.broadcast(artist), "artist_id")
        .filter(F.col("rel_name").isNotNull() & F.col("artist_name").isNotNull())
        .select(
            "work_id",
            F.concat(F.col("rel_name"), F.lit(":"), F.col("artist_name")).alias("tok"),
        )
    )
    agg = toks.groupBy("work_id").agg(
        F.array_join(F.sort_array(F.collect_set("tok")), MV_DELIM).alias("role_pairs"),
        F.count_distinct("tok").alias("n_pairs"),
    )
    return (
        work.join(agg, "work_id", "left")
        .withColumn("n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0)))
        .select("work_id", "work_title", "work_type_id", "role_pairs", "n_pairs")
    )


# --------------------------------------------------------------------------
# S15: Wikidata JSON-lines identity filter
# --------------------------------------------------------------------------

# Rank-bearing claim fixtures (round 4): the occupation property carries
# ranked statements so the truthy gate is load-bearing —
#   %7=1: preferred AFTER a normal decoy (preferred-wins is observable)
#   %7=2: deprecated musician first (naive first-statement pick would
#         wrongly keep this entity)
#   %7=4: all statements deprecated -> no occupation -> dropped
#   %7=6: empty claim list -> dropped
_S15_CLAIMS = {
    0: '[{"rank":"normal","value":"painter"}]',
    1: '[{"rank":"normal","value":"painter"},{"rank":"preferred","value":"musician"}]',
    2: '[{"rank":"deprecated","value":"musician"},{"rank":"normal","value":"painter"}]',
    3: '[{"rank":"normal","value":"composer"},{"rank":"normal","value":"painter"}]',
    4: '[{"rank":"deprecated","value":"singer"}]',
    5: '[{"rank":"preferred","value":"singer"},{"rank":"deprecated","value":"composer"}]',
    6: "[]",
}

_S15_CLAIMS_SQL = " ".join(
    f"WHEN {i} THEN '{_S15_CLAIMS[i].replace(chr(39), chr(39) * 2)}'"
    for i in range(7)
)

_S15_SQL = rf"""
WITH raw AS (
  SELECT '{{"id": "Q' || o_orderkey || '", "claims": {{"occupation": '
         || CASE CAST(o_orderkey % 7 AS INT) {_S15_CLAIMS_SQL} END
         || '}}, "mbid": ' ||
         CASE WHEN o_orderkey % 5 = 0
              THEN '"mb-' || o_orderkey || '"' ELSE 'null' END || '}}'
           AS line
  FROM orders
), parsed AS (
  SELECT json_extract_string(line, '$.id') AS qid,
         json_extract_string(line, '$.mbid') AS mbid,
         json_extract(line, '$.claims.occupation') AS occ
  FROM raw
), unnested AS (
  SELECT qid, mbid, i,
         json_extract_string(occ, '$[' || i || '].rank') AS rank,
         trim(json_extract_string(occ, '$[' || i || '].value'), {_WS}) AS value
  FROM parsed, LATERAL (
    SELECT unnest(range(CAST(json_array_length(occ) AS INT))) AS i
  )
), chosen AS (
  -- truthy gate: deprecated dropped; (preferred-if-any, else normal) +
  -- first-in-statement-order == arg_min over (rank priority, position)
  SELECT qid, mbid,
         arg_min(value, CASE rank WHEN 'preferred' THEN 0 ELSE 1 END * 100000 + i)
           AS occupation
  FROM unnested
  WHERE rank IN ('preferred', 'normal')
    AND value IS NOT NULL AND value <> ''
  GROUP BY qid, mbid
)
SELECT qid, occupation, mbid
FROM chosen
WHERE occupation IN ('musician', 'composer', 'singer')
"""


@q("s15_jsonl_identity", _S15_SQL)
def s15_jsonl_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 (scripts/mdm/harvest/harvest_wikimedia.py:115-131 routing,
    :198-217 ``_truthy_statements``, :266-272 ``_first_truthy_text``):
    stream JSON lines, apply truthy statement selection per property
    (deprecated dropped, preferred replaces normal, first value wins),
    keep music-identity entities, project the identifiers. The claim
    fixture carries rank decoys so the truthy gate is load-bearing; the
    selection runs as higher-order functions inside codegen — no UDF."""
    from tagminder_spark.sources.wikidata import (  # noqa: PLC0415
        CLAIM_SCHEMA,
        first_truthy_value,
    )

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    claims_json = F.element_at(
        F.array(*[F.lit(_S15_CLAIMS[i]) for i in range(7)]),
        (k % 7).cast("int") + 1,
    )
    line = F.concat(
        F.lit('{"id": "Q'),
        k,
        F.lit('", "claims": {"occupation": '),
        claims_json,
        F.lit('}, "mbid": '),
        F.when(k % 5 == 0, F.concat(F.lit('"mb-'), k, F.lit('"'))).otherwise(
            F.lit("null")
        ),
        F.lit("}"),
    )
    raw = o.select(line.alias("line"))
    parsed = raw.select(
        F.get_json_object("line", "$.id").alias("qid"),
        F.get_json_object("line", "$.mbid").alias("mbid"),
        F.from_json(
            F.get_json_object("line", "$.claims.occupation"), CLAIM_SCHEMA
        ).alias("occ"),
    )
    out = parsed.select(
        "qid", first_truthy_value(F.col("occ")).alias("occupation"), "mbid"
    )
    return out.filter(F.col("occupation").isin("musician", "composer", "singer"))


_S3_SQL = """
SELECT '/lib/doc' || CAST(doc_id AS VARCHAR) || '.mp3' AS __path,
       'mp3' AS __filetype,
       CAST(octet_length(encode(text)) % 600 AS VARCHAR) AS __length_seconds,
       'doc' || CAST(doc_id AS VARCHAR) || '.mp3' AS title,
       CAST(octet_length(encode(text)) AS VARCHAR) AS extra_size
FROM documents
"""


@q("s3_tag_parse", _S3_SQL)
def s3_tag_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-parse plumbing (S3, tags2db.py:478-512) value-checked end to
    end: a (path, content) catalog frame flows through the mapInPandas
    parser and the tags→columns pivot with the MapType overflow. The
    deterministic fallback parser (ext, size-derived length, basename
    title, __size overflow tag) is replayed exactly by the oracle, so
    the Arrow batching, tag-map shape, and column fan-out carry real
    data — only the mutagen kernel swaps in on a real library."""
    from tagminder_spark.sources.catalog import parse_tags, tags_to_columns

    d = load_table(spark, sf_dir, "documents")
    files = d.select(
        F.concat(F.lit("/lib/doc"), F.col("doc_id").cast("string"), F.lit(".mp3")).alias(
            "path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    cols = tags_to_columns(parse_tags(files), ["title"])
    return cols.select(
        "__path",
        "__filetype",
        "__length_seconds",
        "title",
        F.element_at(F.col("__extra_tags"), "__size").alias("extra_size"),
    )


_S3_REAL_SQL = """
SELECT '/lib/real' || CAST(doc_id AS VARCHAR) ||
         CASE doc_id % 8 WHEN 0 THEN '.mp3' WHEN 1 THEN '.flac'
                         WHEN 2 THEN '.ogg' WHEN 3 THEN '.m4a'
                         WHEN 4 THEN '.aiff' WHEN 5 THEN '.wma'
                         WHEN 6 THEN '.ape' ELSE '.wv' END AS __path,
       CASE doc_id % 8 WHEN 0 THEN 'mp3' WHEN 1 THEN 'flac'
                       WHEN 2 THEN 'ogg' WHEN 3 THEN 'mp4'
                       WHEN 4 THEN 'aiff' WHEN 5 THEN 'asf'
                       WHEN 6 THEN 'ape' ELSE 'wavpack' END AS __filetype,
       'T' || CAST(doc_id AS VARCHAR) || 'é' AS title,
       'A' || CAST(doc_id % 97 AS VARCHAR) AS artist,
       'AL' || CAST(doc_id % 31 AS VARCHAR) AS album,
       CAST((doc_id % 15) + 1 AS VARCHAR) AS track,
       CASE doc_id % 8
            WHEN 0 THEN 'Rock'
            WHEN 1 THEN CASE WHEN doc_id % 16 >= 8 THEN 'Ambient'
                             ELSE 'Ambient\\\\Chillout' END
            WHEN 2 THEN 'Electronic'
            WHEN 3 THEN 'Ambient'
            WHEN 4 THEN 'Rock'
            WHEN 5 THEN 'Jazz'
            WHEN 6 THEN 'Ambient'
            ELSE 'Electronic' END AS genre,
       CASE doc_id % 8
            WHEN 0 THEN CAST(CAST(FLOOR(((doc_id % 997) * 40 + 40)
                             * 1152.0 / 44100.0) AS BIGINT) AS VARCHAR)
            ELSE CAST((doc_id % 445) + 1 AS VARCHAR)
       END AS __length_seconds
FROM documents
"""


@q("s3_tag_parse_real", _S3_REAL_SQL)
def s3_tag_parse_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL tag IO paths (S3 parse, tags2db.py:478-512; S11
    write-back, :1580-1592) value-checked end to end over actual
    container bytes — ALL 8 supported families.  Every row synthesizes
    a well-formed container — ID3v2.3+Xing MP3, FLAC (STREAMINFO +
    VORBIS_COMMENT), Ogg Vorbis (CRC'd pages + granule duration), MP4
    (moov/mvhd/ilst), AIFF (COMM 80-bit rate + 'ID3 ' chunk), ASF/WMA
    (File Properties + CD/ECD via the real writer), Monkey's Audio and
    WavPack (stream header + APEv2) by doc_id%8 — and rows with
    doc_id%16>=8 are first written with DECOY tags and rewritten in
    place via ``retag_bytes`` (the export sink's writer kernel), so the
    oracle's predicted fields prove EVERY writer preserved the stream
    and replaced the tags.  Decoded through the byte-level pure-Python
    parser inside the mapInPandas seam: encodings (latin-1/UTF-16),
    TCON "(17)"→Rock resolution, the Vorbis tracknumber→track mapping,
    WM/* attribute mapping, multivalue joining, Xing-frame /
    total-samples / granule / mvhd / File-Properties / frames-per-rate
    duration math — all predicted by the generating row."""
    import pandas as pd

    from tagminder_spark.sources.catalog import (
        PARSED_SCHEMA,
        parse_tags_kernel,
        tags_to_columns,
    )

    def build(batches):
        from tagminder_spark.sources.audiotags.synth import (
            build_aiff,
            build_ape,
            build_asf,
            build_flac,
            build_m4a,
            build_mp3_with_xing,
            build_ogg_vorbis,
            build_wavpack,
            retag_bytes,
        )

        exts = {0: ".mp3", 1: ".flac", 2: ".ogg", 3: ".m4a",
                4: ".aiff", 5: ".wma", 6: ".ape", 7: ".wv"}
        genres = {0: "Rock", 1: "Ambient", 2: "Electronic", 3: "Ambient",
                  4: "Rock", 5: "Jazz", 6: "Ambient", 7: "Electronic"}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fmt = did % 8
                rewrite = did % 16 >= 8
                seconds = (did % 445) + 1
                tags = {
                    "title": f"T{did}é",
                    "artist": f"A{did % 97}",
                    "album": f"AL{did % 31}",
                    "track": str(did % 15 + 1),
                }
                build_tags = (
                    {"title": "decoy", "artist": "decoy"} if rewrite else tags
                )
                if fmt == 0:
                    content = build_mp3_with_xing(
                        {**build_tags, "genre": "(17)"},
                        xing_frames=(did % 997) * 40 + 40,
                        enc=0 if did % 32 < 16 else 1,
                    )
                elif fmt == 1:
                    comments = [
                        ("TITLE", build_tags["title"]),
                        ("ARTIST", build_tags["artist"]),
                        ("ALBUM", build_tags.get("album", "x")),
                        ("TRACKNUMBER", build_tags.get("track", "1")),
                        ("GENRE", "Ambient"),
                        ("GENRE", "Chillout"),
                    ]
                    content = build_flac(
                        44100 * seconds + did % 4410,
                        comments,
                        audio_bytes=64,
                    )
                elif fmt == 2:
                    content = build_ogg_vorbis(
                        [
                            ("TITLE", build_tags["title"]),
                            ("ARTIST", build_tags["artist"]),
                            ("ALBUM", build_tags.get("album", "x")),
                            ("TRACKNUMBER", build_tags.get("track", "1")),
                            ("GENRE", "Electronic"),
                        ],
                        total_samples=44100 * seconds + did % 4410,
                    )
                elif fmt == 3:
                    content = build_m4a(
                        {**build_tags, "genre": "Ambient"}, seconds=seconds
                    )
                elif fmt == 4:
                    content = build_aiff(
                        {**build_tags, "genre": "Rock"}, seconds=seconds
                    )
                elif fmt == 5:
                    content = build_asf(
                        {**build_tags, "genre": "Jazz"}, seconds=seconds
                    )
                elif fmt == 6:
                    content = build_ape(
                        {**build_tags, "genre": "Ambient"}, seconds=seconds
                    )
                else:
                    content = build_wavpack(
                        {**build_tags, "genre": "Electronic"}, seconds=seconds
                    )
                if rewrite:
                    content = retag_bytes(
                        content, {**tags, "genre": genres[fmt]}
                    )
                rows.append(
                    {"path": f"/lib/real{did}{exts[fmt]}", "content": content}
                )
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents")
    # fused synth→parse: one Python worker per task, container bytes
    # never cross the Arrow boundary (guide §4; see session.fuse_pandas)
    parsed = spread(d.select("doc_id")).mapInPandas(
        fuse_pandas(build, parse_tags_kernel(True)), PARSED_SCHEMA
    )
    cols = tags_to_columns(
        parsed, ["title", "artist", "album", "track", "genre"]
    )
    return cols.select(
        "__path", "__filetype", "title", "artist", "album", "track",
        "genre", "__length_seconds",
    )


_S78_SQL = """
WITH scanned AS (
  SELECT '/lib/f' || CAST(doc_id AS VARCHAR) AS path,
         1700000000 + doc_id % 1000 AS mtime_epoch
  FROM documents WHERE doc_id % 5 <> 0
), existing AS (
  SELECT '/lib/f' || CAST(doc_id AS VARCHAR) AS __path,
         CAST(1700000000 + CASE WHEN doc_id % 3 = 0 THEN doc_id % 1000 - 7
                                ELSE doc_id % 1000 END AS VARCHAR)
           AS __file_mod_datetime_raw
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT 'modified' AS bucket, s.path
FROM scanned s JOIN existing e ON e.__path = s.path
WHERE CAST(s.mtime_epoch AS DOUBLE) > CAST(e.__file_mod_datetime_raw AS DOUBLE)
UNION ALL
SELECT 'orphan', e.__path
FROM existing e LEFT JOIN scanned s ON s.path = e.__path
WHERE s.path IS NULL
UNION ALL
SELECT 'new', s.path
FROM scanned s LEFT JOIN existing e ON e.__path = s.path
WHERE e.__path IS NULL
"""


@q("s78_incremental_sync", _S78_SQL)
def s78_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental catalog sync (S6/S7/S8, tags2db.py:955-1079): one gate
    covering new-files anti-join, modified-mtime inner join, and orphan
    prune over a synthesized scanned-vs-catalog pair (stale mtimes for
    doc_id%3 rows, scan misses %5, catalog misses %7)."""
    from tagminder_spark.sources.catalog import (
        incremental_modified,
        incremental_new,
        prune_orphans,
    )

    d = load_table(spark, sf_dir, "documents")
    scanned = d.filter(F.col("doc_id") % 5 != 0).select(
        F.concat(F.lit("/lib/f"), F.col("doc_id").cast("string")).alias("path"),
        (F.lit(1700000000) + F.col("doc_id") % 1000).alias("mtime_epoch"),
    )
    existing = d.filter(F.col("doc_id") % 7 != 0).select(
        F.concat(F.lit("/lib/f"), F.col("doc_id").cast("string")).alias("__path"),
        (
            F.lit(1700000000)
            + F.when(
                F.col("doc_id") % 3 == 0, F.col("doc_id") % 1000 - 7
            ).otherwise(F.col("doc_id") % 1000)
        )
        .cast("string")
        .alias("__file_mod_datetime_raw"),
    )
    modified = incremental_modified(scanned, existing).select(
        F.lit("modified").alias("bucket"), "path"
    )
    orphans = prune_orphans(existing, scanned).select(
        F.lit("orphan").alias("bucket"), F.col("__path").alias("path")
    )
    new = incremental_new(scanned, existing).select(
        F.lit("new").alias("bucket"), "path"
    )
    return modified.unionByName(orphans).unionByName(new)


# --------------------------------------------------------------------------
# S14 works metadata resolution (harvest [2/6])
# --------------------------------------------------------------------------

_WT = "(n_nationkey % 8)"
_MBR_WORKTYPE_LINE = (
    f"CAST({_WT} AS STRING) || {_T} ||"
    f" CASE CAST({_WT} AS INT) WHEN 0 THEN 'Song' WHEN 1 THEN 'Aria'"
    f" WHEN 2 THEN 'Opera' WHEN 3 THEN {_N} WHEN 4 THEN 'Suite'"
    f" WHEN 5 THEN 'Musical' WHEN 6 THEN 'Cantata' ELSE 'Ballet' END"
)

_LG = "(n_nationkey % 10)"
# short rows exercise the iso/name positional fallbacks (:157-170)
_MBR_LANG_LINE = (
    f"CASE WHEN {_LG} % 3 = 0"
    f" THEN CAST({_LG} AS STRING) || {_T} || 'xx' || CAST({_LG} AS STRING)"
    f"      || {_T} || 'Lang ' || CAST({_LG} AS STRING)"
    f" ELSE CAST({_LG} AS STRING) || {_T} || {_N} || {_T} || {_N} || {_T} ||"
    f"      'is' || CAST({_LG} AS STRING) || {_T} || 'Language ' || CAST({_LG} AS STRING)"
    f" END"
)

# every value a function of (orderkey, linenumber): the synthetic
# lineitem duplicates that pair, so duplicate rows must be FULL
# duplicates or the min_by tie-break would be nondeterministic
_WLW = "(l_orderkey % 500)"
_WLL = "((l_orderkey + 3 * l_linenumber) % 12)"
_MBR_WORKLANG_LINE = (
    f"CASE WHEN l_linenumber = 6 THEN {_N} || {_T} || '3' || {_T} || '1'"
    f" ELSE CAST({_WLW} AS STRING) || {_T} || CAST({_WLL} AS STRING) || {_T} ||"
    f" CASE CAST((l_orderkey + l_linenumber) % 5 AS INT)"
    f"   WHEN 0 THEN 't' WHEN 1 THEN '1' ELSE '0' END END"
)
_WL_POS = "(l_orderkey * 10 + l_linenumber)"

_AL = "(p_partkey % 500)"
_MBR_ALIAS_LINE = (
    f"'0' || {_T} || CAST({_AL} AS STRING) || {_T} ||"
    f" CASE WHEN p_partkey % 13 = 0 THEN {_N}"
    f" ELSE 'Alias ' || CAST(p_partkey % 37 AS STRING) END"
)

_IW = "((p_partkey + 3) % 500)"
_MBR_ISWC_LINE = (
    f"'0' || {_T} || CAST({_IW} AS STRING) || {_T} ||"
    f" CASE WHEN p_partkey % 17 = 0 THEN {_N}"
    f" ELSE 'T-' || CAST(p_partkey % 97 AS STRING) || '.'"
    f"      || CAST(p_partkey % 9 AS STRING) END"
)

_S14W_SQL = f"""
WITH work_raw AS (SELECT {_mbr_duck(_MBR_WORK_LINE)} AS value FROM orders),
work_f AS (
  SELECT string_split(value, chr(9)) AS f FROM work_raw
  WHERE len(string_split(value, chr(9))) >= 3
),
work_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS work_id,
         {_cl('f[2]')} AS musicbrainz_workid,
         {_cl('f[3]')} AS work_title,
         {_ki('f[4]')} AS work_type_id,
         {_cl('f[5]')} AS work_disambiguation
  FROM work_f WHERE {_ki('f[1]')} IS NOT NULL
),
wt_raw AS (SELECT {_mbr_duck(_MBR_WORKTYPE_LINE)} AS value FROM nation),
wt_f AS (SELECT string_split(value, chr(9)) AS f FROM wt_raw),
wt_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS work_type_id, {_cl('f[2]')} AS work_type_name
  FROM wt_f WHERE {_ki('f[1]')} IS NOT NULL
),
lang_raw AS (SELECT {_mbr_duck(_MBR_LANG_LINE)} AS value FROM nation),
lang_f AS (SELECT string_split(value, chr(9)) AS f FROM lang_raw),
lang_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS lang_id,
         COALESCE({_cl('f[4]')}, {_cl('f[2]')}) AS language_code,
         COALESCE({_cl('f[5]')}, {_cl('f[3]')}) AS language_name
  FROM lang_f WHERE {_ki('f[1]')} IS NOT NULL
),
wl_raw AS (
  SELECT {_mbr_duck(_MBR_WORKLANG_LINE)} AS value,
         {_mbr_duck(_WL_POS)} AS pos
  FROM lineitem
),
wl_f AS (
  SELECT string_split(value, chr(9)) AS f, pos FROM wl_raw
  WHERE len(string_split(value, chr(9))) >= 2
),
wl_t AS (
  SELECT {_ki('f[1]')} AS work_id, {_ki('f[2]')} AS lang_id,
         CASE WHEN lower(trim(COALESCE(f[3], ''), (chr(9)||chr(10)||chr(11)||chr(12)||chr(13)||chr(28)||chr(29)||chr(30)||chr(31)||chr(32)||chr(133)||chr(160)||chr(5760)||chr(8192)||chr(8193)||chr(8194)||chr(8195)||chr(8196)||chr(8197)||chr(8198)||chr(8199)||chr(8200)||chr(8201)||chr(8202)||chr(8232)||chr(8233)||chr(8239)||chr(8287)||chr(12288)))) IN ('1','t','true','y','yes')
              THEN 1 ELSE 0 END AS is_primary,
         pos
  FROM wl_f
  WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
lang_choice AS (
  SELECT work_id,
         arg_min(lang_id, (1 - is_primary) * 100000000 + pos) AS lang_id
  FROM wl_t GROUP BY work_id
),
langs AS (
  SELECT c.work_id, c.lang_id AS language_id, l.language_code, l.language_name
  FROM lang_choice c LEFT JOIN lang_t l USING (lang_id)
),
al_raw AS (SELECT {_mbr_duck(_MBR_ALIAS_LINE)} AS value FROM part),
al_f AS (
  SELECT string_split(value, chr(9)) AS f FROM al_raw
  WHERE len(string_split(value, chr(9))) >= 2
),
al_t AS (
  SELECT {_ki('f[2]')} AS work_id, {_cl('f[3]')} AS alias
  FROM al_f WHERE {_ki('f[2]')} IS NOT NULL AND {_cl('f[3]')} IS NOT NULL
),
aliases AS (
  SELECT work_id, STRING_AGG(DISTINCT alias, '\\\\' ORDER BY alias) AS aliases,
         CAST(COUNT(DISTINCT alias) AS BIGINT) AS n_aliases
  FROM al_t GROUP BY work_id
),
is_raw AS (SELECT {_mbr_duck(_MBR_ISWC_LINE)} AS value FROM part),
is_f AS (
  SELECT string_split(value, chr(9)) AS f FROM is_raw
  WHERE len(string_split(value, chr(9))) >= 2
),
is_t AS (
  SELECT {_ki('f[2]')} AS work_id, {_cl('f[3]')} AS iswc
  FROM is_f WHERE {_ki('f[2]')} IS NOT NULL AND {_cl('f[3]')} IS NOT NULL
),
iswcs AS (
  SELECT work_id, STRING_AGG(DISTINCT iswc, '\\\\' ORDER BY iswc) AS iswcs,
         CAST(COUNT(DISTINCT iswc) AS BIGINT) AS n_iswcs
  FROM is_t GROUP BY work_id
)
SELECT w.work_id, w.musicbrainz_workid, w.work_title, w.work_type_id,
       t.work_type_name, w.work_disambiguation,
       g.language_id, g.language_code, g.language_name,
       a.aliases, COALESCE(a.n_aliases, 0) AS n_aliases,
       i.iswcs, COALESCE(i.n_iswcs, 0) AS n_iswcs
FROM work_t w
LEFT JOIN wt_t t USING (work_type_id)
LEFT JOIN langs g USING (work_id)
LEFT JOIN aliases a USING (work_id)
LEFT JOIN iswcs i USING (work_id)
"""


@q("s14_works_enrich", _S14W_SQL)
def s14_works_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Works metadata resolution (harvest_mb_works.py:480-600, [2/6])
    over member-routed inputs: work-type name join, primary-language
    choice (first primary in source order, else first seen — the
    :431-441 replacement rule, as one min_by aggregate), positional
    iso/name fallbacks (:157-170), and sorted-distinct alias/ISWC
    multi-value aggregation (``_mv_sorted_list`` :82-89). Decoys:
    \\N type names, unresolvable language ids, short language rows
    (fallback path), \\N aliases/ISWCs, \\N work_language keys."""
    from tagminder_spark.sources.mbdump import parse_member, resolve_works  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    work = parse_member(
        o.selectExpr(f"{_MBR_WORK_LINE} AS value"), "work"
    ).distinct()
    work_type = parse_member(
        n.selectExpr(f"{_MBR_WORKTYPE_LINE} AS value"), "work_type"
    ).distinct()
    language = parse_member(
        n.selectExpr(f"{_MBR_LANG_LINE} AS value"), "language"
    ).distinct()
    work_language = parse_member(
        li.selectExpr(f"{_MBR_WORKLANG_LINE} AS value", f"{_WL_POS} AS pos"),
        "work_language",
        passthrough=("pos",),
    )
    work_alias = parse_member(
        p.selectExpr(f"{_MBR_ALIAS_LINE} AS value"), "work_alias"
    )
    iswc = parse_member(p.selectExpr(f"{_MBR_ISWC_LINE} AS value"), "iswc")

    return resolve_works(work, work_type, work_language, language, work_alias, iswc)


# --------------------------------------------------------------------------
# S14 related-works lineage (harvest [3/6])
# --------------------------------------------------------------------------

# positions 0=rowid, 1=link, 2=from_work, 3=to_work
_MBR_LWW_LINE = (
    f"CASE WHEN l_linenumber = 5 THEN 'short'"
    f" ELSE CAST(l_orderkey AS STRING) || {_T}"
    f" || CAST((l_orderkey + l_partkey) % 40 AS STRING) || {_T}"
    f" || CAST(l_orderkey % 500 AS STRING) || {_T}"
    f" || CAST((l_orderkey * 7 + 3 * l_linenumber) % 500 AS STRING) END"
)

_S14RW_SQL = f"""
WITH work_raw AS (SELECT {_mbr_duck(_MBR_WORK_LINE)} AS value FROM orders),
work_f AS (
  SELECT string_split(value, chr(9)) AS f FROM work_raw
  WHERE len(string_split(value, chr(9))) >= 3
),
work_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS work_id,
         {_cl('f[2]')} AS musicbrainz_workid,
         {_cl('f[3]')} AS work_title
  FROM work_f WHERE {_ki('f[1]')} IS NOT NULL
),
link_raw AS (SELECT {_mbr_duck(_MBR_LINK_LINE)} AS value FROM orders),
link_f AS (SELECT string_split(value, chr(9)) AS f FROM link_raw),
link_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS link_type_id
  FROM link_f WHERE {_ki('f[1]')} IS NOT NULL
),
lt_raw AS (SELECT {_mbr_duck(_MBR_LINKTYPE_LINE)} AS value FROM nation),
lt_f AS (SELECT string_split(value, chr(9)) AS f FROM lt_raw),
lt_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_type_id, {_cl('f[7]')} AS rel_name
  FROM lt_f WHERE {_ki('f[1]')} IS NOT NULL
),
lww_raw AS (SELECT {_mbr_duck(_MBR_LWW_LINE)} AS value FROM lineitem),
lww_f AS (
  SELECT string_split(value, chr(9)) AS f FROM lww_raw
  WHERE len(string_split(value, chr(9))) >= 4
),
lww_t AS (
  SELECT {_ki('f[2]')} AS link_id, {_ki('f[3]')} AS from_work_id,
         {_ki('f[4]')} AS to_work_id
  FROM lww_f
  WHERE {_ki('f[2]')} IS NOT NULL AND {_ki('f[3]')} IS NOT NULL
    AND {_ki('f[4]')} IS NOT NULL
),
rels AS (
  SELECT w.from_work_id, w.to_work_id, lt.rel_name
  FROM lww_t w
  LEFT JOIN link_t l USING (link_id)
  LEFT JOIN lt_t lt ON lt.link_type_id = l.link_type_id
),
sym AS (
  SELECT from_work_id AS work_id, to_work_id AS rid, rel_name FROM rels
  UNION ALL
  SELECT to_work_id, from_work_id, rel_name FROM rels
),
joined AS (
  SELECT s.work_id, s.rel_name, a.work_title AS r_title,
         a.musicbrainz_workid AS r_mbid
  FROM sym s LEFT JOIN work_t a ON a.work_id = s.rid
)
SELECT work_id,
       COALESCE(STRING_AGG(DISTINCT r_title, '\\\\' ORDER BY r_title), '')
         AS related_work_titles,
       COALESCE(STRING_AGG(DISTINCT r_mbid, '\\\\' ORDER BY r_mbid), '')
         AS related_work_mbids,
       COALESCE(STRING_AGG(DISTINCT rel_name, '\\\\' ORDER BY rel_name), '')
         AS related_work_relationship_names
FROM joined GROUP BY work_id
"""


@q("s14_related_works", _S14RW_SQL)
def s14_related_works(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-works lineage (harvest_mb_works.py:545-556, 628-654):
    l_work_work edges symmetrized so both endpoints relate, rel names
    resolved through link→link_type, and per-work sorted-distinct MV
    emissions of related titles / MBIDs / relationship names. Decoys:
    short edge rows, edges pointing at parsed-out works (their titles
    drop; the edge still contributes its rel name)."""
    from tagminder_spark.sources.mbdump import parse_member, related_works  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")

    work = parse_member(
        o.selectExpr(f"{_MBR_WORK_LINE} AS value"), "work"
    ).distinct()
    link = parse_member(
        o.selectExpr(f"{_MBR_LINK_LINE} AS value"), "link"
    ).select("link_id", "link_type_id").distinct()
    link_type = parse_member(
        n.selectExpr(f"{_MBR_LINKTYPE_LINE} AS value"), "link_type"
    ).select("link_type_id", "rel_name").distinct()
    lww = parse_member(li.selectExpr(f"{_MBR_LWW_LINE} AS value"), "l_work_work")

    return related_works(work, lww, link, link_type)


# --------------------------------------------------------------------------
# S14 end-to-end works lookup (harvest [5/6] final_df assembly)
# --------------------------------------------------------------------------

_S14LOOKUP_SQL = f"""
SELECT e.work_id, e.musicbrainz_workid, e.work_title, e.work_type_id,
       e.work_type_name, e.work_disambiguation,
       e.language_id, e.language_code, e.language_name,
       e.aliases, e.n_aliases, e.iswcs, e.n_iswcs,
       r.role_pairs, COALESCE(r.n_pairs, 0) AS n_pairs,
       w.related_work_titles, w.related_work_mbids,
       w.related_work_relationship_names
FROM ({_S14W_SQL}) e
LEFT JOIN (SELECT work_id, role_pairs, n_pairs FROM ({_S14R_SQL})) r
  USING (work_id)
LEFT JOIN ({_S14RW_SQL}) w USING (work_id)
"""


@q("s14_works_lookup", _S14LOOKUP_SQL)
def s14_works_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end works lookup table (harvest_mb_works.py:678-700,
    [5/6] final_df): member routing → metadata resolution → role-pair
    aggregation → related-works lineage, assembled with left joins on
    work_id exactly as the reference materializes its final frame. Each
    constituent is independently value-gated; this gate pins the
    composition."""
    enrich = s14_works_enrich(spark, sf_dir)
    roles = s14_mb_member_routing(spark, sf_dir).select(
        "work_id", "role_pairs", "n_pairs"
    )
    related = s14_related_works(spark, sf_dir)
    return (
        enrich.join(roles, "work_id", "left")
        .join(related, "work_id", "left")
        .withColumn("n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0)))
    )


# --------------------------------------------------------------------------
# S14 role-label derivation (link phrases + attribute fallback)
# --------------------------------------------------------------------------

_LT2 = "(n_nationkey % 8)"
# variants: %4=0 named; 1 fwd wins; 2 rev wins; 3 all null -> attr fallback
_MBR_LINKTYPE2_LINE = (
    f"CAST({_LT2} AS STRING) || {_T} || {_N} || {_T} || '0' || {_T} ||"
    f" 'gid-' || CAST({_LT2} AS STRING) || {_T} || 'artist' || {_T} || 'work'"
    f" || {_T} ||"
    f" CASE CAST({_LT2} % 4 AS INT) WHEN 0 THEN 'composer' ELSE {_N} END"
    f" || {_T} || {_N} || {_T} ||"
    f" CASE CAST({_LT2} % 4 AS INT) WHEN 1 THEN 'performed on' ELSE {_N} END"
    f" || {_T} ||"
    f" CASE CAST({_LT2} % 4 AS INT) WHEN 1 THEN 'performance of'"
    f" WHEN 2 THEN 'revision of' ELSE {_N} END"
)

# positions 0=link, 1=attribute_type
_MBR_LINKATTR_LINE = (
    f"CASE WHEN l_linenumber = 4 THEN 'short'"
    f" ELSE CAST((l_orderkey + l_partkey) % 40 AS STRING) || {_T}"
    f" || CAST(l_partkey % 6 AS STRING) END"
)

# 0=id,1=parent,2=root,3=fallback-name,4=gid,5=name
_LA = "(n_nationkey % 6)"
_MBR_LINKATTRTYPE_LINE = (
    f"CAST({_LA} AS STRING) || {_T} || {_N} || {_T} || '0' || {_T} ||"
    f" 'alt' || CAST({_LA} AS STRING) || {_T} ||"
    f" 'gg-' || CAST({_LA} AS STRING) || {_T} ||"
    f" CASE CAST({_LA} AS INT) WHEN 0 THEN 'guitar' WHEN 1 THEN 'piano'"
    f" WHEN 2 THEN {_N} WHEN 3 THEN 'violin' WHEN 4 THEN 'orchestra'"
    f" ELSE 'strings' END"
)

# 0=link, 1=attribute_type, 2=text_value
_MBR_LINKATTRTEXT_LINE = (
    f"CAST(p_partkey % 40 AS STRING) || {_T}"
    f" || CAST(p_partkey % 6 AS STRING) || {_T}"
    f" || CASE WHEN p_partkey % 5 = 0 THEN {_N}"
    f" ELSE 'v' || CAST(p_partkey % 9 AS STRING) END"
)

_S14RL_SQL = f"""
WITH link_raw AS (SELECT {_mbr_duck(_MBR_LINK_LINE)} AS value FROM orders),
link_f AS (SELECT string_split(value, chr(9)) AS f FROM link_raw),
link_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS link_type_id
  FROM link_f WHERE {_ki('f[1]')} IS NOT NULL
),
lt_raw AS (SELECT {_mbr_duck(_MBR_LINKTYPE2_LINE)} AS value FROM nation),
lt_f AS (SELECT string_split(value, chr(9)) AS f FROM lt_raw),
lt_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_type_id, {_cl('f[7]')} AS rel_name,
         {_cl('f[9]')} AS link_phrase, {_cl('f[10]')} AS reverse_link_phrase
  FROM lt_f WHERE {_ki('f[1]')} IS NOT NULL
),
la_raw AS (SELECT {_mbr_duck(_MBR_LINKATTR_LINE)} AS value FROM lineitem),
la_f AS (
  SELECT string_split(value, chr(9)) AS f FROM la_raw
  WHERE len(string_split(value, chr(9))) >= 2
),
la_t AS (
  SELECT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS attr_type_id
  FROM la_f WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
lat_raw AS (SELECT {_mbr_duck(_MBR_LINKATTRTYPE_LINE)} AS value FROM nation),
lat_f AS (SELECT string_split(value, chr(9)) AS f FROM lat_raw),
lat_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS attr_type_id,
         COALESCE({_cl('f[6]')}, {_cl('f[4]')}) AS role
  FROM lat_f WHERE {_ki('f[1]')} IS NOT NULL
),
ltv_raw AS (SELECT {_mbr_duck(_MBR_LINKATTRTEXT_LINE)} AS value FROM part),
ltv_f AS (SELECT string_split(value, chr(9)) AS f FROM ltv_raw),
ltv_t AS (
  SELECT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS attr_type_id
  FROM ltv_f WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
lt_join AS (
  SELECT l.link_id,
         COALESCE(t.rel_name, t.link_phrase, t.reverse_link_phrase) AS primary_
  FROM link_t l LEFT JOIN lt_t t USING (link_type_id)
),
with_primary AS (
  SELECT link_id, primary_ AS role FROM lt_join WHERE primary_ IS NOT NULL
),
attr_ids AS (
  SELECT DISTINCT link_id, attr_type_id FROM (
    SELECT link_id, attr_type_id FROM la_t
    UNION ALL SELECT link_id, attr_type_id FROM ltv_t
  )
),
attr_names AS (
  SELECT a.link_id, n.role
  FROM attr_ids a JOIN lat_t n USING (attr_type_id)
  WHERE n.role IS NOT NULL
),
fallback AS (
  SELECT DISTINCT an.link_id, an.role
  FROM attr_names an
  WHERE an.link_id IN (SELECT link_id FROM lt_join WHERE primary_ IS NULL)
),
roles AS (
  SELECT DISTINCT link_id, role FROM (
    SELECT * FROM with_primary UNION ALL SELECT * FROM fallback
  )
)
SELECT link_id,
       STRING_AGG(DISTINCT role, '\\\\' ORDER BY role) AS roles,
       CAST(COUNT(DISTINCT role) AS BIGINT) AS n_roles
FROM roles GROUP BY link_id
"""


@q("s14_role_labels", _S14RL_SQL)
def s14_role_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-label derivation (harvest_mb_works.py:172-198 + attrs_by_link
    :507-524): relationship name wins, else forward phrase, else reverse
    phrase, else the link's attribute names (several labels per link).
    Exercises four more member parsers — link_type phrase columns,
    link_attribute, link_attribute_type with the positional name
    fallback, link_attribute_text_value key contribution — with decoys
    on each (short rows, \\N names, all-null link types)."""
    from tagminder_spark.functions.core import MV_DELIM  # noqa: PLC0415
    from tagminder_spark.sources.mbdump import derive_role_labels, parse_member  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    link = parse_member(
        o.selectExpr(f"{_MBR_LINK_LINE} AS value"), "link"
    ).select("link_id", "link_type_id").distinct()
    link_type = parse_member(
        n.selectExpr(f"{_MBR_LINKTYPE2_LINE} AS value"), "link_type"
    ).distinct()
    link_attr = parse_member(
        li.selectExpr(f"{_MBR_LINKATTR_LINE} AS value"), "link_attribute"
    )
    link_attr_type = parse_member(
        n.selectExpr(f"{_MBR_LINKATTRTYPE_LINE} AS value"), "link_attribute_type"
    ).distinct()
    text_vals = parse_member(
        p.selectExpr(f"{_MBR_LINKATTRTEXT_LINE} AS value"),
        "link_attribute_text_value",
    )

    roles = derive_role_labels(
        link, link_type, link_attr, link_attr_type, text_vals
    )
    return roles.groupBy("link_id").agg(
        F.array_join(F.sort_array(F.collect_set("role")), MV_DELIM).alias("roles"),
        F.count_distinct("role").alias("n_roles"),
    )


# --------------------------------------------------------------------------
# S14 artists harvest (harvest_mb_artists.py end-to-end)
# --------------------------------------------------------------------------

_U = "(p_partkey % 400)"
_MBR_URL_LINE = (
    f"CAST({_U} AS STRING) || {_T} || 'gid' || {_T} ||"
    f" CASE CAST({_U} % 5 AS INT)"
    f" WHEN 0 THEN 'https://www.wikidata.org/wiki/Q' || CAST({_U} AS STRING)"
    f" WHEN 1 THEN 'https://allmusic.com/artist/mn' ||"
    f"      lpad(CAST({_U} AS STRING), 10, '0')"
    f" WHEN 2 THEN 'https://example.com/x' || CAST({_U} AS STRING)"
    f" WHEN 3 THEN 'https://ALLMUSIC.com/artist/MN' ||"
    f"      lpad(CAST({_U} AS STRING), 10, '0')"
    f" ELSE {_N} END"
)

# positions 0=rowid, 1=link, 2=artist, 3=url; everything a function of
# (orderkey, linenumber) so duplicate lineitem pairs stay full duplicates
_LAU_A = "((l_orderkey + 2 * l_linenumber) % 300)"
_LAU_U = "((l_orderkey * 3 + l_linenumber) % 400)"
_MBR_LAU_LINE = (
    f"CASE WHEN l_linenumber = 3 THEN 'short'"
    f" ELSE CAST(l_orderkey AS STRING) || {_T} || '0' || {_T}"
    f" || CAST({_LAU_A} AS STRING) || {_T} || CAST({_LAU_U} AS STRING) END"
)
_LAU_POS = "(l_orderkey * 10 + l_linenumber)"

_AF = "(c_custkey % 300)"
_MBR_ARTISTFULL_LINE = (
    f"CAST({_AF} AS STRING) || {_T} || 'am-' || CAST({_AF} AS STRING) || {_T} ||"
    f" CASE WHEN {_AF} % 31 = 0 THEN {_N}"
    f" ELSE 'Artist ' || CAST({_AF} AS STRING) END"
    f" || {_T} || {_N}"  # 3 = sort name (unused)
    f" || {_T} || CASE WHEN {_AF} % 4 = 0 THEN {_N}"
    f"            ELSE CAST(1900 + {_AF} % 100 AS STRING) END"  # 4 begin_year
    f" || {_T} || CAST({_AF} % 12 + 1 AS STRING)"  # 5 begin_month
    f" || {_T} || 'xx'"  # 6 begin_day: garbage -> NULL int
    f" || {_T} || {_N} || {_T} || {_N} || {_T} || {_N}"  # 7-9 end date
    f" || {_T} || CAST({_AF} % 3 AS STRING)"  # 10 type
    f" || {_T} || CAST({_AF} % 50 AS STRING)"  # 11 area
    f" || {_T} || CAST({_AF} % 2 + 1 AS STRING)"  # 12 gender
    f" || {_T} || CASE WHEN {_AF} % 7 = 0"
    f"            THEN 'dis ' || CAST({_AF} AS STRING) ELSE {_N} END"  # 13
    f" || {_T} || {_N} || {_T} || {_N}"  # 14-15 filler
    f" || {_T} || CASE CAST({_AF} % 3 AS INT) WHEN 0 THEN 't'"
    f"            WHEN 1 THEN '1' ELSE 'f' END"  # 16 ended
)

_S14A_SQL = f"""
WITH url_raw AS (SELECT {_mbr_duck(_MBR_URL_LINE)} AS value FROM part),
url_f AS (SELECT string_split(value, chr(9)) AS f FROM url_raw),
url_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS url_id, {_cl('f[3]')} AS url
  FROM url_f WHERE {_ki('f[1]')} IS NOT NULL AND {_cl('f[3]')} IS NOT NULL
),
url_map AS (
  SELECT url_id,
         CASE WHEN wd <> '' THEN 'wikidata'
              WHEN am <> '' THEN 'allmusic' END AS source,
         CASE WHEN wd <> '' THEN wd WHEN am <> '' THEN am END AS norm_id
  FROM (
    SELECT url_id,
           upper(regexp_extract(url, '(?i)wikidata\\.org/.+?(Q\\d+)', 1)) AS wd,
           lower(regexp_extract(url, '(?i)(mn\\d{{10}})', 1)) AS am
    FROM url_t
  )
  WHERE wd <> '' OR am <> ''
),
lau_raw AS (
  SELECT {_mbr_duck(_MBR_LAU_LINE)} AS value, {_mbr_duck(_LAU_POS)} AS pos
  FROM lineitem
),
lau_f AS (
  SELECT string_split(value, chr(9)) AS f, pos FROM lau_raw
  WHERE len(string_split(value, chr(9))) >= 4
),
lau_t AS (
  SELECT {_ki('f[3]')} AS artist_id, {_ki('f[4]')} AS url_id, pos
  FROM lau_f
  WHERE {_ki('f[3]')} IS NOT NULL AND {_ki('f[4]')} IS NOT NULL
),
links AS (
  SELECT l.artist_id, m.source, m.norm_id, l.pos
  FROM lau_t l JOIN url_map m USING (url_id)
),
agg AS (
  SELECT artist_id,
         arg_max(CASE WHEN source = 'wikidata' THEN norm_id END,
                 CASE WHEN source = 'wikidata' THEN pos END) AS wikidata_id,
         arg_max(CASE WHEN source = 'allmusic' THEN norm_id END,
                 CASE WHEN source = 'allmusic' THEN pos END) AS allmusic_mnid
  FROM links GROUP BY artist_id
),
af_raw AS (SELECT {_mbr_duck(_MBR_ARTISTFULL_LINE)} AS value FROM customer),
af_f AS (
  SELECT string_split(value, chr(9)) AS f FROM af_raw
  WHERE len(string_split(value, chr(9))) >= 17
),
af_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS artist_id,
         {_cl('f[2]')} AS artist_mbid, {_cl('f[3]')} AS artist_name,
         {_ki('f[5]')} AS begin_year, {_ki('f[6]')} AS begin_month,
         {_ki('f[7]')} AS begin_day,
         {_ki('f[11]')} AS artist_type, {_ki('f[12]')} AS area,
         {_ki('f[13]')} AS gender, {_cl('f[14]')} AS disambiguation,
         CASE WHEN lower(trim(COALESCE(f[17], ''), (chr(9)||chr(10)||chr(11)||chr(12)||chr(13)||chr(28)||chr(29)||chr(30)||chr(31)||chr(32)||chr(133)||chr(160)||chr(5760)||chr(8192)||chr(8193)||chr(8194)||chr(8195)||chr(8196)||chr(8197)||chr(8198)||chr(8199)||chr(8200)||chr(8201)||chr(8202)||chr(8232)||chr(8233)||chr(8239)||chr(8287)||chr(12288)))) IN ('1','t','true','y','yes')
              THEN 1 ELSE 0 END AS ended
  FROM af_f WHERE {_ki('f[1]')} IS NOT NULL
)
SELECT a.artist_id, a.artist_mbid, a.artist_name, a.begin_year,
       a.begin_month, a.begin_day, a.artist_type, a.area, a.gender,
       a.disambiguation, a.ended,
       CASE WHEN g.wikidata_id LIKE 'Q%'
            THEN 'http://www.wikidata.org/entity/' || g.wikidata_id END
         AS wikidata_uri,
       g.wikidata_id, g.allmusic_mnid
FROM af_t a LEFT JOIN agg g USING (artist_id)
"""


@q("s14_artists_harvest", _S14A_SQL)
def s14_artists_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The musicbrainz_artists harvest end-to-end (harvest_mb_artists
    .py:138-345): URL-registry regex routing (wikidata first, qid
    uppercased; allmusic mnid lowercased; unsupported URLs drop),
    last-link-wins artist↔URL resolution in source order, and the full
    17-column artist row parse (garbage ints → NULL, bool ended).
    Decoys: unmatched URLs, \\N URLs, short link rows, \\N names,
    garbage date ints, mixed-case allmusic hosts."""
    from tagminder_spark.sources.mbdump import harvest_artists, parse_member  # noqa: PLC0415

    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    url = parse_member(p.selectExpr(f"{_MBR_URL_LINE} AS value"), "url").distinct()
    lau = parse_member(
        li.selectExpr(f"{_MBR_LAU_LINE} AS value", f"{_LAU_POS} AS pos"),
        "l_artist_url",
        passthrough=("pos",),
    )
    artist = parse_member(
        c.selectExpr(f"{_MBR_ARTISTFULL_LINE} AS value"), "artist_full"
    ).distinct()

    out = harvest_artists(url, lau, artist)
    return out.select(
        "artist_id", "artist_mbid", "artist_name", "begin_year",
        "begin_month", "begin_day", "artist_type", "area", "gender",
        "disambiguation", "ended", "wikidata_uri", "wikidata_id",
        "allmusic_mnid",
    )


# --------------------------------------------------------------------------
# S14 relationship harvests: recording↔work and artist↔artist edges
# (harvest_mb_recording_work_relationships.py, harvest_mb_artist_relationships.py)
# --------------------------------------------------------------------------

# full link row w/ dates: 0=id, 1=link_type, 2-7=begin/end ymd, 8=attr
# count, 9=created, 10=ended.  Decoy: %37=0 rows are short (ids 0 and 37
# never parse, so edges referencing them exercise the missing-link skip).
_LF = "(o_orderkey % 40)"
_MBR_LINKFULL_LINE = (
    f"CASE WHEN {_LF} % 37 = 0 THEN 'short' ELSE"
    f" CAST({_LF} AS STRING) || {_T} || CAST({_LF} % 8 AS STRING) || {_T} ||"
    f" CASE WHEN {_LF} % 5 = 0 THEN {_N}"
    f"      ELSE CAST(1950 + {_LF} AS STRING) END || {_T} ||"
    f" CAST({_LF} % 12 + 1 AS STRING) || {_T} || {_N} || {_T} ||"
    f" CASE WHEN {_LF} % 3 = 0 THEN {_N}"
    f"      ELSE CAST(2000 + {_LF} % 20 AS STRING) END || {_T} ||"
    f" {_N} || {_T} || {_N} || {_T} || '0' || {_T} || 'x' || {_T} ||"
    f" CASE WHEN {_LF} % 2 = 1 THEN 't' ELSE '0' END END"
)

# l_recording_work from customer: 0=rowid, 1=link (%44: 40-43 are
# absent from the link dump → skip path), 2=recording, 3=work,
# 4=link_order, 5/6=credits.  Decoys: short rows, \N link key.
_RW = "c_custkey"
_MBR_LRW_LINE = (
    f"CASE WHEN {_RW} % 53 = 0 THEN 'short'"
    f" WHEN {_RW} % 47 = 0 THEN CAST({_RW} AS STRING) || {_T} || {_N}"
    f"      || {_T} || '1' || {_T} || '2'"
    f" ELSE CAST({_RW} AS STRING) || {_T}"
    f" || CAST({_RW} % 44 AS STRING) || {_T}"
    f" || CAST(({_RW} * 7) % 300 AS STRING) || {_T}"
    f" || CAST({_RW} % 500 AS STRING) || {_T}"
    f" || CAST({_RW} % 5 AS STRING) || {_T}"
    f" || CASE WHEN {_RW} % 3 = 0 THEN {_N}"
    f"    ELSE 'c0-' || CAST({_RW} % 9 AS STRING) END || {_T}"
    f" || CASE WHEN {_RW} % 4 = 0 THEN {_N}"
    f"    ELSE 'c1-' || CAST({_RW} % 6 AS STRING) END END"
)

# recording member from customer: 0=id, 1=gid, 2=title.  Decoy: short
# rows (the reference RAISES there; the distributed parse quarantines,
# so those recording ids resolve to NULL metadata through the left join).
_RC = "(c_custkey % 300)"
_MBR_RECORDING_LINE = (
    f"CASE WHEN {_RC} % 41 = 0 THEN CAST({_RC} AS STRING)"
    f" ELSE CAST({_RC} AS STRING) || {_T} || 'rec-' || CAST({_RC} AS STRING)"
    f" || {_T} || CASE WHEN {_RC} % 13 = 0 THEN {_N}"
    f"    ELSE 'Rec ' || CAST({_RC} AS STRING) END END"
)

# link_attribute / text-value / credit fixtures from part, keyed %44 so
# some attribute links miss the edge set too
_PA = "p_partkey"
_MBR_LINKATTR2_LINE = (
    f"CASE WHEN {_PA} % 59 = 0 THEN 'short'"
    f" ELSE CAST({_PA} % 44 AS STRING) || {_T}"
    f" || CAST({_PA} % 6 AS STRING) END"
)
# text/credit values are FUNCTIONS of their (link, attr_type) key —
# several part rows collapse onto one key, so a key-independent value
# would make the per-key dedup pick arbitrary in both engines
_MBR_LINKATTRTEXT2_LINE = (
    f"CAST({_PA} % 44 AS STRING) || {_T} || CAST({_PA} % 6 AS STRING) || {_T}"
    f" || CASE WHEN ({_PA} % 44 + {_PA} % 6) % 5 = 0 THEN {_N}"
    f" ELSE 'v' || CAST(({_PA} % 44 + {_PA} % 6) % 9 AS STRING) END"
)
_MBR_LINKATTRCREDIT_LINE = (
    f"CAST({_PA} % 44 AS STRING) || {_T} || CAST(({_PA} + 1) % 6 AS STRING)"
    f" || {_T} || CASE WHEN ({_PA} % 44 + ({_PA} + 1) % 6) % 7 = 0 THEN {_N}"
    f" ELSE 'as ' || CAST(({_PA} % 44 + ({_PA} + 1) % 6) % 4 AS STRING) END"
)

_BOOLSQL = (
    "CASE WHEN lower(trim(coalesce({x}, ''), " + _WS + ")) IN"
    " ('1','t','true','y','yes') THEN 1 ELSE 0 END"
)

_LINKFULL_CTE = f"""
lf_raw AS (SELECT {_mbr_duck(_MBR_LINKFULL_LINE)} AS value FROM orders),
lf_f AS (SELECT string_split(value, chr(9)) AS f FROM lf_raw),
lf_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS link_type_id,
         {_ki('f[3]')} AS begin_year, {_ki('f[4]')} AS begin_month,
         {_ki('f[5]')} AS begin_day, {_ki('f[6]')} AS end_year,
         {_ki('f[7]')} AS end_month, {_ki('f[8]')} AS end_day,
         {_BOOLSQL.format(x="f[11]")} AS is_ended
  FROM lf_f WHERE {_ki('f[1]')} IS NOT NULL
),
lt2_raw AS (SELECT {_mbr_duck(_MBR_LINKTYPE2_LINE)} AS value FROM nation),
lt2_f AS (SELECT string_split(value, chr(9)) AS f FROM lt2_raw),
lt2_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_type_id, {_cl('f[7]')} AS relationship_name,
         {_cl('f[9]')} AS relationship_phrase_forward,
         {_cl('f[10]')} AS relationship_phrase_reverse
  FROM lt2_f WHERE {_ki('f[1]')} IS NOT NULL
)"""

_S14RWR_SQL = f"""
WITH {_LINKFULL_CTE},
rw_raw AS (SELECT {_mbr_duck(_MBR_LRW_LINE)} AS value FROM customer),
rw_f AS (
  SELECT string_split(value, chr(9)) AS f FROM rw_raw
  WHERE len(string_split(value, chr(9))) >= 4
),
rw_t AS (
  SELECT {_ki('f[1]')} AS edge_row_id, {_ki('f[2]')} AS link_id,
         {_ki('f[3]')} AS entity0_id, {_ki('f[4]')} AS entity1_id,
         {_ki('f[5]')} AS link_order, {_cl('f[6]')} AS entity0_credit,
         {_cl('f[7]')} AS entity1_credit
  FROM rw_f
  WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
    AND {_ki('f[3]')} IS NOT NULL AND {_ki('f[4]')} IS NOT NULL
),
rec_raw AS (SELECT {_mbr_duck(_MBR_RECORDING_LINE)} AS value FROM customer),
rec_f AS (
  SELECT string_split(value, chr(9)) AS f FROM rec_raw
  WHERE len(string_split(value, chr(9))) >= 3
),
rec_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS recording_id, {_cl('f[2]')} AS recording_mbid,
         {_cl('f[3]')} AS title
  FROM rec_f WHERE {_ki('f[1]')} IS NOT NULL
),
la2_raw AS (SELECT {_mbr_duck(_MBR_LINKATTR2_LINE)} AS value FROM part),
la2_f AS (
  SELECT string_split(value, chr(9)) AS f FROM la2_raw
  WHERE len(string_split(value, chr(9))) >= 2
),
la2_t AS (
  SELECT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS attr_type_id FROM la2_f
  WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
lat_raw AS (SELECT {_mbr_duck(_MBR_LINKATTRTYPE_LINE)} AS value FROM nation),
lat_f AS (SELECT string_split(value, chr(9)) AS f FROM lat_raw),
lat_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS attr_type_id,
         COALESCE({_cl('f[6]')}, {_cl('f[4]')}) AS attribute_name
  FROM lat_f WHERE {_ki('f[1]')} IS NOT NULL
),
ltv2_raw AS (SELECT {_mbr_duck(_MBR_LINKATTRTEXT2_LINE)} AS value FROM part),
ltv2_f AS (SELECT string_split(value, chr(9)) AS f FROM ltv2_raw),
ltv2_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS attr_type_id,
         {_cl('f[3]')} AS attribute_text_value
  FROM ltv2_f WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
lac_raw AS (SELECT {_mbr_duck(_MBR_LINKATTRCREDIT_LINE)} AS value FROM part),
lac_f AS (SELECT string_split(value, chr(9)) AS f FROM lac_raw),
lac_t AS (
  SELECT DISTINCT {_ki('f[1]')} AS link_id, {_ki('f[2]')} AS attr_type_id,
         {_cl('f[3]')} AS credited_as
  FROM lac_f WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
),
edges AS (
  SELECT rw.*, lf.link_type_id, lf.begin_year, lf.end_year, lf.is_ended,
         lt.relationship_name
  FROM rw_t rw
  JOIN lf_t lf USING (link_id)
  LEFT JOIN lt2_t lt USING (link_type_id)
),
attrs AS (
  SELECT e.edge_row_id,
         n.attribute_name || '=' || coalesce(tv.attribute_text_value, '')
           || '/' || coalesce(cr.credited_as, '') AS tok
  FROM la2_t a
  JOIN edges e USING (link_id)
  LEFT JOIN lat_t n USING (attr_type_id)
  LEFT JOIN ltv2_t tv USING (link_id, attr_type_id)
  LEFT JOIN lac_t cr USING (link_id, attr_type_id)
),
attr_agg AS (
  SELECT edge_row_id, CAST(COUNT(*) AS BIGINT) AS n_attrs,
         STRING_AGG(DISTINCT tok, '\\\\' ORDER BY tok) AS attr_toks
  FROM attrs GROUP BY edge_row_id
)
SELECT e.edge_row_id, e.link_id, e.entity0_id AS recording_id,
       e.entity1_id AS work_id, e.link_order, e.entity0_credit,
       e.entity1_credit, e.link_type_id, e.relationship_name,
       e.begin_year, e.end_year, e.is_ended,
       r.recording_mbid, r.title,
       COALESCE(a.n_attrs, 0) AS n_attrs, a.attr_toks
FROM edges e
LEFT JOIN rec_t r ON r.recording_id = e.entity0_id
LEFT JOIN attr_agg a USING (edge_row_id)
"""


@q("s14_recording_work_rels", _S14RWR_SQL)
def s14_recording_work_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recording↔work relationship harvest
    (harvest_mb_recording_work_relationships.py:298-500): typed edges
    from l_recording_work × full link (dates + ended, INNER — absent
    links skip the edge) × link_type (LEFT), recording identity bridged
    in (harvest_mb_recordings.py:131-144), and per-edge attributes with
    name fallback, text values and credited-as.  Four more member
    parsers exercised with decoys: link_full short rows (missing-link
    skip), \\N link keys, short recording rows (the reference raises;
    the distributed parse quarantines → NULL metadata), %44 attr links
    that miss the edge set."""
    from tagminder_spark.functions.core import MV_DELIM  # noqa: PLC0415
    from tagminder_spark.sources.mbdump import (  # noqa: PLC0415
        parse_member,
        relationship_attributes,
        relationship_edges,
    )

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    lf = parse_member(
        o.selectExpr(f"{_MBR_LINKFULL_LINE} AS value"), "link_full"
    ).distinct()
    lt = parse_member(
        n.selectExpr(f"{_MBR_LINKTYPE2_LINE} AS value"), "link_type"
    ).distinct()
    rw = parse_member(
        c.selectExpr(f"{_MBR_LRW_LINE} AS value"), "l_recording_work"
    )
    rec = parse_member(
        c.selectExpr(f"{_MBR_RECORDING_LINE} AS value"), "recording"
    ).distinct()
    la = parse_member(
        p.selectExpr(f"{_MBR_LINKATTR2_LINE} AS value"), "link_attribute"
    )
    lat = parse_member(
        n.selectExpr(f"{_MBR_LINKATTRTYPE_LINE} AS value"),
        "link_attribute_type",
    ).distinct()
    ltv = parse_member(
        p.selectExpr(f"{_MBR_LINKATTRTEXT2_LINE} AS value"),
        "link_attribute_text_value",
    )
    lac = parse_member(
        p.selectExpr(f"{_MBR_LINKATTRCREDIT_LINE} AS value"),
        "link_attribute_credit",
    )

    edges = relationship_edges(rw, lf, lt)
    attrs = relationship_attributes(edges, la, lat, ltv, lac)
    tok = F.concat(
        F.col("attribute_name"), F.lit("="),
        F.coalesce(F.col("attribute_text_value"), F.lit("")),
        F.lit("/"), F.coalesce(F.col("credited_as"), F.lit("")),
    )
    attr_agg = attrs.groupBy("edge_row_id").agg(
        F.count(F.lit(1)).alias("n_attrs"),
        F.array_join(F.sort_array(F.collect_set(tok)), MV_DELIM).alias(
            "attr_toks"
        ),
    )
    return (
        edges.join(
            rec, edges["entity0_id"] == rec["recording_id"], "left"
        )
        .join(attr_agg, "edge_row_id", "left")
        .select(
            "edge_row_id",
            "link_id",
            edges["entity0_id"].alias("recording_id"),
            edges["entity1_id"].alias("work_id"),
            "link_order",
            "entity0_credit",
            "entity1_credit",
            "link_type_id",
            "relationship_name",
            "begin_year",
            "end_year",
            "is_ended",
            "recording_mbid",
            "title",
            F.coalesce(F.col("n_attrs"), F.lit(0)).alias("n_attrs"),
            "attr_toks",
        )
    )


# l_artist_artist from supplier: credits sit at positions 7/8
_AA = "s_suppkey"
_MBR_LAA_LINE = (
    f"CASE WHEN {_AA} % 31 = 0 THEN 'short'"
    f" ELSE CAST({_AA} AS STRING) || {_T}"
    f" || CAST({_AA} % 44 AS STRING) || {_T}"
    f" || CAST({_AA} % 300 AS STRING) || {_T}"
    f" || CAST(({_AA} * 3) % 300 AS STRING) || {_T}"
    f" || CAST({_AA} % 4 AS STRING) || {_T} || 'f5' || {_T} || 'f6' || {_T}"
    f" || CASE WHEN {_AA} % 5 = 0 THEN {_N}"
    f"    ELSE 'p0-' || CAST({_AA} % 8 AS STRING) END || {_T}"
    f" || 'p1-' || CAST({_AA} % 7 AS STRING) END"
)

_S14AAR_SQL = f"""
WITH {_LINKFULL_CTE},
aa_raw AS (SELECT {_mbr_duck(_MBR_LAA_LINE)} AS value FROM supplier),
aa_f AS (
  SELECT string_split(value, chr(9)) AS f FROM aa_raw
  WHERE len(string_split(value, chr(9))) >= 4
),
aa_t AS (
  SELECT {_ki('f[1]')} AS edge_row_id, {_ki('f[2]')} AS link_id,
         {_ki('f[3]')} AS entity0_id, {_ki('f[4]')} AS entity1_id,
         {_ki('f[5]')} AS link_order, {_cl('f[8]')} AS entity0_credit,
         {_cl('f[9]')} AS entity1_credit
  FROM aa_f
  WHERE {_ki('f[1]')} IS NOT NULL AND {_ki('f[2]')} IS NOT NULL
    AND {_ki('f[3]')} IS NOT NULL AND {_ki('f[4]')} IS NOT NULL
)
SELECT e.edge_row_id, e.link_id, e.entity0_id AS from_artist_id,
       e.entity1_id AS to_artist_id, e.link_order, e.entity0_credit,
       e.entity1_credit, lt.relationship_name,
       lt.relationship_phrase_forward, lt.relationship_phrase_reverse,
       lf.begin_year, lf.begin_month, lf.end_year, lf.is_ended
FROM aa_t e
JOIN lf_t lf USING (link_id)
LEFT JOIN lt2_t lt USING (link_type_id)
"""


@q("s14_artist_rels", _S14AAR_SQL)
def s14_artist_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artist↔artist relationship harvest
    (harvest_mb_artist_relationships.py:369-430): same edge composition
    as recording↔work but the entity credits sit at columns 7/8 of
    l_artist_artist — the member spec difference IS the port surface.
    Short-row decoys + %44 links exercise the width guard and the
    missing-link skip."""
    from tagminder_spark.sources.mbdump import (  # noqa: PLC0415
        parse_member,
        relationship_edges,
    )

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    lf = parse_member(
        o.selectExpr(f"{_MBR_LINKFULL_LINE} AS value"), "link_full"
    ).distinct()
    lt = parse_member(
        n.selectExpr(f"{_MBR_LINKTYPE2_LINE} AS value"), "link_type"
    ).distinct()
    aa = parse_member(
        s.selectExpr(f"{_MBR_LAA_LINE} AS value"), "l_artist_artist"
    )
    return relationship_edges(aa, lf, lt).select(
        "edge_row_id",
        "link_id",
        F.col("entity0_id").alias("from_artist_id"),
        F.col("entity1_id").alias("to_artist_id"),
        "link_order",
        "entity0_credit",
        "entity1_credit",
        "relationship_name",
        "relationship_phrase_forward",
        "relationship_phrase_reverse",
        "begin_year",
        "begin_month",
        "end_year",
        "is_ended",
    )
