"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family, weighted toward the shapes that
# dominate at 100 TB (wide agg, fact-fact join, dedup family, ANN).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "j_broadcast_dim",
    "a_sequence_gaps",
    "a_album_signature",
    "w_top1_per_group",
    "t_sessionize",
    "g_cooccurrence_edges",
    "f_tokens_dedup",
    "d_exact_dup",
    "d_ngram_jaccard",
    "d_minhash_lsh",
    "t_quality_score",
    "ann_topk_cosine",
    "pl_step18_mbids",
    "pl_step22_works",
    "pl_step15_similarity",
    "a_salted_agg",
    "pl_chain_e2e",
    # promoted from extra_queries in round 3 (first measured in round 2;
    # BASELINE.md §4 records their standing numbers)
    "d_embedding_lsh",
    "d_ngram_jaccard_capped",
    "er_five_phase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entry
    from tagminder_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry.queries()

    # Warm the JVM + file listing once with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: materializes every output column (count() would let
        # Catalyst prune the computed projections away).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # Round-3 operators, timed separately: NOT in the headline total
    # until a first measurement is on record (BASELINE.md protocol).
    extra: dict[str, float] = {}
    for name in ("s98_rename_plan", "ann_ivf_trained", "h_works_role_pairs"):
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        extra[name] = round(time.perf_counter() - t0, 3)
        print(f"# extra {name}: {extra[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
