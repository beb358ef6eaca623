"""MERGE-strategy scale probe (round 10): measure the write-path cost
of the three MERGE shapes the manifest format offers, on the axis that
separates them — TABLE SIZE under a FIXED-SIZE update set.

- **full rewrite** (``merge_into_manifest(file_granular=False)``):
  reads and rewrites every file — cost must grow linearly with the
  table.
- **copy-on-write** (``file_granular=True``): rewrites only files whose
  key bounds can contain an updated key — with a range-clustered layout
  and a narrow update range, cost must stay ~flat as the table grows.
- **merge-on-read** (``merge_on_read``): writes the update rows + an
  equality-delete file, touches no data file — cost must stay flat AND
  below CoW (it skips the survivors' read+write entirely).
  ``materialize_deletes`` afterwards shows the deferred half of the
  trade (≈ CoW's cost, paid on the maintenance cadence instead of per
  merge).

Each table: ``rows`` synthetic docs range-clustered on ``doc_id`` into
``files`` parquet files with committed doc_id bounds; the update always
touches the bottom ~1/16 of the key range.  MIN of ``reps`` wall times
per cell.  Output: one JSON line per cell + summary exponents →
``merge_strategy.json``; numbers recorded in BASELINE.md.

Run: ``python tools/merge_strategy_check.py [out.json]``
"""
from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from tagminder_spark.operators.table_manifest import (  # noqa: E402
    init_manifest,
    materialize_deletes,
    merge_into_manifest,
    merge_on_read,
    read_manifest,
    snapshot_read,
)
from tagminder_spark.session import get_spark  # noqa: E402

#: (rows, files): file SIZE is held constant (~12.5k rows/file) so the
#: table grows by adding files — the way a real table grows.  The
#: update always touches the same absolute key range (the bottom
#: 12,500 keys ≈ one file), so CoW's touched set is constant while
#: full-rewrite's work grows with the table.
SIZES = [(200_000, 16), (800_000, 64), (3_200_000, 256),
         (12_800_000, 1024)]
UPDATE_ROWS = 12_500
REPS = 2


def _make_table(spark, root: str, rows: int, files: int) -> None:
    df = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
        (F.col("id") * 13 % 9973).alias("n_chars"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
    )
    (
        df.repartitionByRange(files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(root)
    )
    init_manifest(spark, root, stats_cols=("doc_id",))


def _updates(spark, rows: int):
    cut = UPDATE_ROWS
    return spark.range(cut).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
        F.lit(-1).cast("long").alias("n_chars"),
        F.lit("updated").alias("text"),
    )


def main(out_path: str | None = None) -> dict:
    spark = get_spark()
    results: dict = {"probes": []}
    base = tempfile.mkdtemp(prefix="merge_probe_")
    try:
        for rows, files in SIZES:
            for strategy in ("full", "cow", "mor", "mor+materialize"):
                best = float("inf")
                report = None
                for _ in range(REPS):
                    root = f"{base}/t_{rows}_{strategy}_{time.time_ns()}"
                    _make_table(spark, root, rows, files)
                    upd = _updates(spark, rows)
                    t0 = time.perf_counter()
                    if strategy == "full":
                        report = merge_into_manifest(
                            spark, root, upd, "doc_id",
                            file_granular=False,
                        )
                    elif strategy == "cow":
                        report = merge_into_manifest(
                            spark, root, upd, "doc_id",
                        )
                    else:
                        report = merge_on_read(spark, root, upd, "doc_id")
                        if strategy == "mor+materialize":
                            report = materialize_deletes(spark, root)
                    dt = time.perf_counter() - t0
                    best = min(best, dt)
                    # correctness spot-check on the last rep
                    n = snapshot_read(spark, root).count()
                    assert n == rows, (strategy, rows, n)
                    man = read_manifest(spark, root)
                    shutil.rmtree(root)
                row = {
                    "probe": "merge_strategy",
                    "strategy": strategy,
                    "rows": rows,
                    "files": files,
                    "sec": round(best, 3),
                    "files_rewritten": report.get(
                        "files_rewritten",
                        report.get("files_replaced", 0),
                    ),
                }
                results["probes"].append(row)
                print(json.dumps(row), flush=True)

        def _exp(strategy: str) -> float:
            pts = [
                (p["rows"], p["sec"]) for p in results["probes"]
                if p["strategy"] == strategy
            ]
            (x0, y0), (x1, y1) = pts[0], pts[-1]
            return round(math.log(y1 / y0) / math.log(x1 / x0), 2)

        results["summary"] = {
            "exponent_full": _exp("full"),
            "exponent_cow": _exp("cow"),
            "exponent_mor": _exp("mor"),
            "exponent_mor_materialize": _exp("mor+materialize"),
            "note": "sec vs rows at fixed update size; full should be "
                    "~1, cow/mor ~0 (flat), mor < cow at every size",
        }
        print(json.dumps(results["summary"]), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
