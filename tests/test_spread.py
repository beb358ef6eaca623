"""Python-boundary parallelism (optimization round 13): per-row decode
kernels must not run single-task on a single-split scan.

``spread`` round-robins the tiny id frame to ``defaultParallelism``
partitions immediately before the first mapInPandas stage, so the whole
chained kernel pipeline (synth → decode) parallelizes. Row-set semantics
are untouched — these pins hold the plan shape and the value identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tagminder_spark.session import load_table, spread
from tests.conftest import SF_DIR


def test_spread_partition_count_and_rows(spark):
    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    s = spread(d)
    assert (
        s.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # round-robin placement only: the multiset of rows is unchanged
    assert sorted(r[0] for r in s.collect()) == sorted(
        r[0] for r in d.collect()
    )


def test_decode_kernels_run_spread(spark):
    """The benched codec gates must carry the round-robin exchange below
    their first Python stage (measured: mm_real_mp3_frames 12.1 s
    single-task vs 1.2 s spread at 32 cores, same values)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("mm_real_mp3_frames", "mm_real_wv_chunks",
                 "s3_tag_parse_real"):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" in plan, name
