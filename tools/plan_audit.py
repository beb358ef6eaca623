"""Physical-plan audit for the headline queries.

For each query: counts shuffle exchanges, broadcast vs sort-merge joins,
whole-stage-codegen spans, file scans, and reports parquet PushedFilters /
ReadSchema — the checklist from the scale mandate (pushdown reached the
scan? small side broadcast? how many shuffles?). Run after changing any
operator; diff the output.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def audit(plan: str) -> dict:
    ops = Counter(
        m.group(1)
        for m in re.finditer(
            r"\b(Exchange hashpartitioning|Exchange SinglePartition|"
            r"BroadcastExchange|SortMergeJoin|BroadcastHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct|HashAggregate|"
            r"ObjectHashAggregate|SortAggregate|Window|FileScan|"
            r"ArrowEvalPython|BatchEvalPython|InMemoryTableScan)",
            plan,
        )
    )
    codegen_ids = set(re.findall(r"codegen id : (\d+)", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "shuffles": ops["Exchange hashpartitioning"] + ops["Exchange SinglePartition"],
        "broadcast_joins": ops["BroadcastHashJoin"],
        "sortmerge_joins": ops["SortMergeJoin"],
        "nested_loop_joins": ops["BroadcastNestedLoopJoin"] + ops["CartesianProduct"],
        # split out for flagging: CartesianProduct is the real
        # scale-killer (both sides shuffled, O(n·m) unbounded); a
        # BroadcastNestedLoopJoin only exists when the build side fits
        # the broadcast threshold — in this codebase always a 1-row
        # scalar frame (crossJoin(F.broadcast(agg)) pattern), O(n·1)
        "cartesian_joins": ops["CartesianProduct"],
        "broadcast_nlj": ops["BroadcastNestedLoopJoin"],
        "aggregates": ops["HashAggregate"] + ops["ObjectHashAggregate"] + ops["SortAggregate"],
        "windows": ops["Window"],
        "scans": ops["FileScan"] + ops["InMemoryTableScan"],
        "python_evals": ops["ArrowEvalPython"] + ops["BatchEvalPython"],
        "codegen_spans": len(codegen_ids),
        "pushed_filters": [p for p in pushed if p],
    }


def main() -> None:
    import os

    from bench import EXTRA, HEADLINE

    import __spark_entry__ as entry
    from tagminder_spark.session import get_spark

    # round-4 source/harvest gates: not in the bench sets but their
    # join-graph plans are exactly what the scale audit should see
    R4_GATES = [
        "s14_mb_member_routing",
        "s14_works_enrich",
        "s14_related_works",
        "s14_role_labels",
        "s14_artists_harvest",
        "s14_works_lookup",
        "v89_validate_vetted",
        "r91_snapshot_compare",
        # round-4 second sweep: relationship harvests + curation family
        "s14_recording_work_rels",
        "s14_artist_rels",
        "cur_temperature_sample",
        "cur_pack_shards",
        "cur_source_quota",
        "cur_quality_buckets",
    ]

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = sys.argv[2:] or (HEADLINE + EXTRA + R4_GATES)
    spark = get_spark("plan_audit")
    qs = entry.queries()
    for name in only:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        a = audit(plan)
        # formatted explain carries the [codegen id : N] annotations that
        # the pre-AQE executedPlan toString lacks (each op also repeats in
        # the detail section there, so op COUNTS come from toString only)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        a["codegen_spans"] = len(
            set(re.findall(r"codegen id : (\d+)", qe.explainString(mode)))
        )
        flags = []
        if a["cartesian_joins"]:
            flags.append("CARTESIAN!")
        if a["broadcast_nlj"]:
            flags.append(f"scalar-xjoin×{a['broadcast_nlj']}")
        if a["sortmerge_joins"] > a["broadcast_joins"] and a["sortmerge_joins"] > 2:
            flags.append("many-SMJ")
        if a["python_evals"]:
            flags.append(f"py×{a['python_evals']}")
        print(
            f"{name:28s} shuffles={a['shuffles']:2d} bhj={a['broadcast_joins']:2d} "
            f"smj={a['sortmerge_joins']:2d} win={a['windows']} agg={a['aggregates']:2d} "
            f"scans={a['scans']:2d} codegen={a['codegen_spans']:2d} "
            f"{' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
