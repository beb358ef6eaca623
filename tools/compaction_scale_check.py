"""Compaction stressed on its REAL axis — file count (VERDICT r6 #3).

Synthesizes tens of thousands of small parquet files (driver-side: one
seed file per lang, hardlinked N times — listing and footer costs are
identical to distinct files), then measures:

- ``list_data_files`` wall time at increasing file counts → the listing
  exponent (must be ~O(files): pure metadata RPCs);
- one full ``compact_shards`` rewrite at the top file count → end-to-end
  maintenance cost and the file-count reduction.

Usage: python tools/compaction_scale_check.py [max_files] [out.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_tree(root: str, n_files: int, langs: int = 8) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    seeds = []
    for li in range(langs):
        d = os.path.join(root, f"lang={chr(97 + li)}{chr(97 + li)}")
        os.makedirs(d, exist_ok=True)
        seed = os.path.join(d, "part-00000-seed.parquet")
        tbl = pa.table({
            "doc_id": pa.array(range(li * 1000, li * 1000 + 50)),
            "text": pa.array([f"doc {i} body" for i in range(50)]),
            "n_chars": pa.array([11] * 50),
        })
        pq.write_table(tbl, seed)
        seeds.append((d, seed))
    per_dir = max(1, n_files // langs)
    for d, seed in seeds:
        for i in range(1, per_dir):
            dst = os.path.join(d, f"part-{i:05d}.parquet")
            if not os.path.exists(dst):
                os.link(seed, dst)


def main() -> None:
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from tagminder_spark.operators.compaction import (
        compact_shards,
        list_data_files,
    )
    from tagminder_spark.session import get_spark

    spark = get_spark()
    report: dict = {"listing": [], "rewrite": None}
    base = tempfile.mkdtemp(prefix="compact_scale_")
    try:
        counts = [c for c in (1_000, 5_000, 20_000, max_files)
                  if c <= max_files]
        for n in counts:
            tree = os.path.join(base, f"tree_{n}")
            t0 = time.time()
            make_tree(tree, n)
            t_make = time.time() - t0
            t0 = time.time()
            files = list_data_files(spark, tree)
            t_list = time.time() - t0
            report["listing"].append(
                {"files": len(files), "list_sec": round(t_list, 3),
                 "make_sec": round(t_make, 1)}
            )
            print(f"files={len(files):>6}  list={t_list:.3f}s", flush=True)
            if n != max_files:
                shutil.rmtree(tree, ignore_errors=True)

        # listing exponent over the measured ladder
        pts = [(r["files"], max(r["list_sec"], 1e-3))
               for r in report["listing"]]
        if len(pts) >= 2:
            (x0, y0), (x1, y1) = pts[0], pts[-1]
            report["listing_exponent"] = round(
                math.log(y1 / y0) / math.log(x1 / x0), 2
            )

        tree = os.path.join(base, f"tree_{max_files}")
        out = os.path.join(base, "compacted")
        t0 = time.time()
        rep = compact_shards(
            spark, tree, out,
            partition_cols=("lang",), order_col="doc_id",
        )
        rep["rewrite_sec"] = round(time.time() - t0, 1)
        report["rewrite"] = rep
        print(json.dumps(report, indent=2))
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(report, fh, indent=2)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
