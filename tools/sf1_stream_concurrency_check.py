"""VERDICT r7 #4 at full scale: the streaming ingest + auto-maintenance
loop at sf1 (50k docs) in MANIFEST mode, with a concurrent reader
thread pinning snapshots while micro-batches append and maintenance
compacts between them.

Checks (prints one JSON line):
- every snapshot the reader observed is a union of COMPLETE
  micro-batches (prefix-consistent; never a half-written batch),
- snapshot row-counts are monotone non-decreasing,
- the final table is row-identical to the source corpus,
- maintenance fired at least once and compacted real files.

Usage: python tools/sf1_stream_concurrency_check.py [sf_dir]
"""
from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from tagminder_spark.session import get_spark, load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    spark = get_spark("sf1-stream-concurrency")
    from tagminder_spark.operators.table_manifest import snapshot_read
    from tagminder_spark.streaming.ingest import (
        streaming_ingest_with_maintenance,
    )

    base = tempfile.mkdtemp(prefix="tm_sf1_stream_")
    src = f"{base}/src"
    table = f"{base}/table"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_total = docs.count()
    docs.repartition(6).write.parquet(src)

    batch_sets = [
        frozenset(
            r["doc_id"] for r in spark.read.parquet(f).collect()
        )
        for f in sorted(glob.glob(f"{src}/part-*.parquet"))
    ]

    observed: list[int] = []
    violations: list[str] = []
    stop = threading.Event()

    def reader() -> None:
        prev: set = set()
        while not stop.is_set():
            try:
                got = {
                    r["doc_id"]
                    for r in snapshot_read(spark, table)
                    .select("doc_id")
                    .collect()
                }
            except FileNotFoundError:
                continue
            except Exception as e:  # noqa: BLE001
                violations.append(f"reader raised: {e!r}")
                return
            matched = [b for b in batch_sets if b <= got]
            union = set().union(*matched) if matched else set()
            if got != union:
                violations.append(
                    f"snapshot of {len(got)} rows is not a union of "
                    f"complete batches"
                )
            if not got >= prev:
                violations.append("snapshot went backwards")
            observed.append(len(got))
            prev = got

    t0 = time.time()
    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
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
        use_manifest=True,
    )
    q.processAllAvailable()
    q.stop()
    stop.set()
    rt.join(60)
    wall = time.time() - t0

    final = snapshot_read(spark, table).select("doc_id").collect()
    final_ids = {r["doc_id"] for r in final}
    ok = (
        not violations
        and len(final) == n_total
        and final_ids == set().union(*batch_sets)
        and bool(q.maintenance_reports)
    )
    print(json.dumps({
        "check": "sf1_stream_concurrency",
        "ok": ok,
        "rows": n_total,
        "snapshots_observed": len(observed),
        "maintenance_passes": len(q.maintenance_reports),
        "violations": violations[:5],
        "wall_s": round(wall, 1),
    }))
    shutil.rmtree(base, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
