"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> <query> [query ...]
       (sf dir from $SPARK_GRAFT_SF_DIR, default sf0.1)

The dump is the pre-execution formatted plan (AdaptiveSparkPlan
isFinalPlan=false where AQE applies) — the declarative shape the judge
checks claims against: Exchange count/placement, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import __spark_entry__ as entry
    from tagminder_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_dump")
    qs = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
