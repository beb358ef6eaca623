"""MusicBrainz-ID steps (reference parity → SURVEY.md Appendix A).

- 18 populate MBIDs          18-populate-musicbrainz-ids.py:142-1000
- 23 retire synthetic MBIDs  23-retire-synthetic-mbids.py:117-470

Design: the contributor→MBID dimension is *not* config-scale (hundreds of
thousands of rows), so resolution runs as posexplode → broadcast join →
ordered re-collect — one shuffle per step, token order preserved by
position. The reference's interactive namesake prompts (18:448-668)
become a decisions-table join (``_USR_disambiguation_decisions``), its
own persistence model (18:237-313); unresolved namesakes are left
untouched for the next decisions run instead of blocking a cluster job.

Synthetic IDs: the reference emits RFC-4122 UUIDv5 (SHA-1) in a private
namespace (18:73, 160). SHA-1 is not portable to every SQL engine we
oracle against, so this engine derives the deterministic synthetic ID
from MD5 in the RFC-4122 **v3** layout over the same
namespace-string+name input — same properties (deterministic, collision-
resistant at library scale, version-nibble marks it non-real), different
constant bits. Detection of "synthetic" is therefore *recomputation
equality* (id == synthetic(name)), which is exact and needs no side
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagminder_spark.functions.core import MV_DELIM

#: Namespace literal mixed into every synthetic ID (mirrors the
#: reference's tagminder.synthetic.mbid.v1 URL namespace, 18:73).
SYNTHETIC_NAMESPACE = "tagminder.synthetic.mbid.v1:"

_MV_RE = MV_DELIM.replace("\\", "\\\\")


def norm_name(c: Column) -> Column:
    """Lowercase, collapse whitespace — the reference's normalize_string
    (18:124-139)."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def synthetic_mbid(name: Column) -> Column:
    """Deterministic synthetic MBID: md5(namespace + normalized name) in
    RFC-4122 v3 layout (version nibble '3', variant nibble '8')."""
    h = F.md5(F.concat(F.lit(SYNTHETIC_NAMESPACE), norm_name(name)))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(F.lit("8"), F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def _raw_tokens(c: Column) -> Column:
    """Split/trim/drop-blank WITHOUT dedup — positional alignment between
    a name cell and an id cell requires keeping duplicates in place."""
    toks = F.split(F.coalesce(c, F.lit("")), _MV_RE)
    toks = F.transform(toks, lambda x: F.trim(x))
    return F.filter(toks, lambda x: x != "")


def step18_mbids(
    df: DataFrame,
    disambiguated: DataFrame,
    namesakes: DataFrame | None = None,
    decisions: DataFrame | None = None,
    name_col: str = "artist",
    id_col: str = "musicbrainz_artistid",
    key: str = "__path",
) -> DataFrame:
    """Resolve each contributor token to an MBID, positionally aligned
    with the name tokens (names↔mbids alignment, tm_graph.py:63-88):

    1. unique name in the disambiguated dimension → its MBID;
    2. namesake (ambiguous name) → the user-decisions table keyed by
       (name, albumartist context) if present, else left unresolved
       (empty slot) for a future decisions run;
    3. unknown name → deterministic synthetic ID.

    disambiguated: (norm_name, mbid) unique per name. namesakes:
    (norm_name) — names with >1 real MBID. decisions:
    (norm_name, context, mbid).
    """
    has_ctx = "albumartist" in df.columns
    ctx = norm_name(F.col("albumartist")) if has_ctx else F.lit("")
    toks = _raw_tokens(F.col(name_col))
    base = df.select(
        key, ctx.alias("__ctx"), toks.alias("__toks"), F.size(toks).alias("__n")
    )

    dis = F.broadcast(
        disambiguated.select(
            norm_name(F.col("norm_name")).alias("norm_name"),
            F.col("mbid").alias("__dis_mbid"),
        )
    )
    ns = (
        F.broadcast(
            namesakes.select(
                norm_name(F.col("norm_name")).alias("norm_name"),
                F.lit(True).alias("__is_namesake"),
            ).dropDuplicates(["norm_name"])
        )
        if namesakes is not None
        else None
    )
    dec = (
        F.broadcast(
            decisions.select(
                norm_name(F.col("norm_name")).alias("norm_name"),
                norm_name(F.col("context")).alias("__ctx"),
                F.col("mbid").alias("__dec_mbid"),
            )
        )
        if decisions is not None
        else None
    )

    def resolve(frame: DataFrame) -> DataFrame:
        """frame(norm_name, __ctx, name_tok, ...) + the three broadcast
        joins → + __mbid."""
        r = frame.join(dis, "norm_name", "left")
        r = (
            r.join(ns, "norm_name", "left")
            if ns is not None
            else r.withColumn("__is_namesake", F.lit(None).cast("boolean"))
        )
        r = (
            r.join(dec, ["norm_name", "__ctx"], "left")
            if dec is not None
            else r.withColumn("__dec_mbid", F.lit(None).cast("string"))
        )
        mbid = (
            F.when(
                F.col("__is_namesake").isNotNull(),
                F.col("__dec_mbid"),  # namesake: only a user decision resolves
            )
            .when(F.col("__dis_mbid").isNotNull(), F.col("__dis_mbid"))
            .otherwise(synthetic_mbid(F.col("name_tok")))
        )
        return r.withColumn("__mbid", mbid)

    # Fast path — single-token cells (the vast majority of a music
    # library) resolve with broadcast joins only: no explode, no
    # re-collect shuffle. Only multi-value cells pay the positional
    # explode + groupBy rebuild.
    single = base.filter(F.col("__n") == 1).select(
        key,
        "__ctx",
        F.element_at("__toks", 1).alias("name_tok"),
    ).withColumn("norm_name", norm_name(F.col("name_tok")))
    single_ids = resolve(single).select(
        key, F.coalesce(F.col("__mbid"), F.lit("")).alias("__ids")
    )

    multi = base.filter(F.col("__n") >= 2).select(
        key,
        "__ctx",
        F.posexplode("__toks").alias("pos", "name_tok"),
    ).withColumn("norm_name", norm_name(F.col("name_tok")))
    multi_ids = (
        resolve(multi)
        .groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "__mbid"))
            ).alias("__slots")
        )
        .select(
            key,
            F.array_join(
                F.transform(
                    F.col("__slots"), lambda s: F.coalesce(s["__mbid"], F.lit(""))
                ),
                MV_DELIM,
            ).alias("__ids"),
        )
    )
    rebuilt = single_ids.unionByName(multi_ids)
    return (
        df.join(rebuilt, key, "left")
        .withColumn(
            id_col,
            F.when(F.col("__ids").isNotNull() & (F.col("__ids") != ""), F.col("__ids"))
            .otherwise(F.col(id_col) if id_col in df.columns else F.lit(None).cast("string")),
        )
        .drop("__ids")
    )


def step23_retire_synthetic(
    df: DataFrame,
    disambiguated: DataFrame,
    name_col: str = "artist",
    id_col: str = "musicbrainz_artistid",
) -> DataFrame:
    """Re-resolve synthetic IDs to real ones where the dimension has
    since learned the name. A slot is synthetic iff it equals the
    deterministic synthetic ID of its positionally-aligned name token;
    real IDs and unresolved slots pass through unchanged (23:117-470).

    Zero shuffle when the dimension broadcasts: zip name/id tokens,
    lookup by normalized name via the broadcast map join, rebuild.
    """
    dis = F.broadcast(
        disambiguated.select(
            norm_name(F.col("norm_name")).alias("norm_name"),
            F.col("mbid").alias("__real_mbid"),
        )
    )
    names = _raw_tokens(F.col(name_col)).alias("n")
    ids = _raw_tokens(F.col(id_col)).alias("i")
    key_rows = (
        df.select(
            "__path",
            F.posexplode(F.arrays_zip(names, ids)).alias("pos", "pair"),
        )
        .select(
            "__path",
            "pos",
            F.col("pair.n").alias("name_tok"),
            F.col("pair.i").alias("id_tok"),
        )
        .withColumn("norm_name", norm_name(F.col("name_tok")))
    )
    joined = key_rows.join(dis, "norm_name", "left")
    new_id = F.when(
        (F.col("id_tok") == synthetic_mbid(F.col("name_tok")))
        & F.col("__real_mbid").isNotNull(),
        F.col("__real_mbid"),
    ).otherwise(F.col("id_tok"))
    rebuilt = (
        joined.withColumn("__new_id", new_id)
        .groupBy("__path")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "__new_id"))).alias("__slots")
        )
        .select(
            "__path",
            F.array_join(
                F.transform(
                    F.col("__slots"), lambda s: F.coalesce(s["__new_id"], F.lit(""))
                ),
                MV_DELIM,
            ).alias("__ids2"),
        )
    )
    return (
        df.join(rebuilt, "__path", "left")
        .withColumn(
            id_col,
            F.when(F.col("__ids2").isNotNull() & (F.col("__ids2") != ""), F.col("__ids2"))
            .otherwise(F.col(id_col)),
        )
        .drop("__ids2")
    )
