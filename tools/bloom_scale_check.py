"""Bloom-index READ-path scale probe (round 12, VERDICT r11 #1).

The r11 read path collected EVERY per-file bitmap to the driver
(~1.2 MB/file at fpp 0.01 ⇒ ~120 GB at 100k files — an OOM on the
first point lookup).  The r12 path bounds driver memory by the
CANDIDATE SET: `rel IN (survivors)` is pushed into a rel-sorted,
rel-range-partitioned sidecar, the cache is byte-bounded, and above
a byte budget the membership test runs distributed and only dropped
rel strings come back.

This probe builds a SYNTHETIC 100k-entry sidecar (realistic bitmap
size: m = 9,984 bits ≈ 1.25 KB/file — fpp 0.01 at ~1k distinct/file;
the bound scales linearly in m, so the conclusion holds at 1M-row
files' ~1.2 MB bitmaps) plus its bloomdoc, then measures, for
candidate sets of 8 / 64 / 512 files and for the forced distributed
fallback:

1. **driver bitmap bytes cached** — must track the candidate set,
   never the 100k-entry table;
2. **wall time per prune** — the rel-pushdown read must stay
   sub-second warm;
3. **value identity** — every path (driver, distributed) keeps/drops
   the same files.

Output: one JSON line per measurement + a summary; numbers recorded
in SCALE.md.  Run: ``python tools/bloom_scale_check.py [out.json]``
"""
from __future__ import annotations

import hashlib
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tagminder_spark.operators.table_manifest as tm  # noqa: E402
from tagminder_spark.session import get_spark  # noqa: E402

N_FILES = 100_000
M_BITS = 9_984  # whole bytes; ~1.25 KB per bitmap
K = 7


def _calibration() -> dict:
    t0 = time.perf_counter()
    acc = b"x" * 64
    for _ in range(20000):
        acc = hashlib.md5(acc).digest() + acc[:48]
    return {"md5_20k_sec": round(time.perf_counter() - t0, 4)}


def _synth_sidecar(spark, root: str) -> list:
    """100k (rel, bloom, m, k) rows + bloomdoc; each file's filter
    contains exactly its own key f"key{i}" — so a lookup for key i
    keeps file i and provably drops every other candidate."""
    import numpy as np

    from pyspark.sql import functions as F

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                bits = np.zeros(M_BITS // 8, dtype=np.uint8)
                tm._bloom_set_bits(bits, [f"key{int(i)}"], M_BITS, K)
                out.append(
                    {"rel": f"part-{int(i):08d}.parquet",
                     "bloom": bits.tobytes(), "n": 0,
                     "m": M_BITS, "k": K}
                )
            yield pd.DataFrame(
                out, columns=["rel", "bloom", "n", "m", "k"]
            )

    side = (
        spark.range(N_FILES).select(F.col("id"))
        .mapInPandas(gen, "rel string, bloom binary, n long, m int, k int")
    )
    sidecar_rel = f"{tm.MANIFEST_DIR}/bloom_key_1.parquet"
    total = N_FILES * (M_BITS // 8)
    nparts = max(1, -(-total // (128 << 20)))
    (
        side.repartitionByRange(nparts, "rel")
        .sortWithinPartitions("rel")
        .write.mode("overwrite").parquet(f"{root}/{sidecar_rel}")
    )
    doc = {"col": "key", "generation": 1, "fpp": 0.01,
           "sidecar": sidecar_rel, "kind": "string",
           "m": M_BITS, "k": K}
    mdir = Path(root) / tm.MANIFEST_DIR
    (mdir / "bloomdoc_key_1.json").write_text(
        json.dumps(doc, separators=(",", ":"))
    )
    return [[f"part-{i:08d}.parquet", 1 << 20] for i in range(N_FILES)]


def _reset_cache():
    tm._BLOOM_CACHE = type(tm._BLOOM_CACHE)()
    tm._BLOOM_CACHE_BYTES = 0


def main(out_path: str | None = None) -> None:
    spark = get_spark(app="bloom-scale-check")
    tmp = tempfile.mkdtemp(prefix="bloomscale_")
    results: list[dict] = []
    try:
        root = f"{tmp}/t"
        Path(root, tm.MANIFEST_DIR).mkdir(parents=True)
        t0 = time.perf_counter()
        entries = _synth_sidecar(spark, root)
        build_sec = time.perf_counter() - t0
        table_bytes = N_FILES * (M_BITS // 8)
        print(json.dumps({"probe": "synth", "files": N_FILES,
                          "bitmap_bytes_each": M_BITS // 8,
                          "table_bitmap_bytes": table_bytes,
                          "build_sec": round(build_sec, 2)}))

        for n_cand in (8, 64, 512):
            cands = entries[:: N_FILES // n_cand][:n_cand]
            where = [("key", "=", "key0")]  # keeps file 0, drops rest
            _reset_cache()
            t0 = time.perf_counter()
            kept_cold = tm._bloom_prune(spark, root, cands, where)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            kept_warm = tm._bloom_prune(spark, root, cands, where)
            warm = time.perf_counter() - t0
            assert [r for r, _ in kept_cold] == ["part-00000000.parquet"]
            assert kept_warm == kept_cold
            rec = {
                "probe": "driver_path", "candidates": n_cand,
                "kept": len(kept_cold),
                "driver_bitmap_bytes_cached": tm._BLOOM_CACHE_BYTES,
                "bytes_vs_table_pct": round(
                    100 * tm._BLOOM_CACHE_BYTES / table_bytes, 3),
                "cold_sec": round(cold, 3), "warm_sec": round(warm, 4),
            }
            print(json.dumps(rec))
            results.append(rec)
            assert len(tm._BLOOM_CACHE) <= n_cand

        # distributed fallback over the FULL 100k candidate set —
        # triggers naturally: 100k × 1,248 B ≈ 125 MB > the 32 MB budget
        _reset_cache()
        where = [("key", "=", "key0")]
        t0 = time.perf_counter()
        kept = tm._bloom_prune(spark, root, entries, where)
        dist = time.perf_counter() - t0
        rec = {
            "probe": "distributed_path", "candidates": N_FILES,
            "kept": len(kept),
            "driver_bitmap_bytes_cached": tm._BLOOM_CACHE_BYTES,
            "sec": round(dist, 2),
        }
        print(json.dumps(rec))
        results.append(rec)
        assert [r for r, _ in kept] == ["part-00000000.parquet"]
        assert tm._BLOOM_CACHE_BYTES == 0

        # build-path probe (VERDICT r11 #7): scalar reference loop vs
        # the vectorized _bloom_set_bits at a 1M-row file, bit-identical
        import numpy as np

        nvals = 1_000_000
        vals = [str(i * 2654435761 % 999999937) for i in range(nvals)]
        bm, bk = tm._bloom_params(nvals, 0.01)
        ref = bytearray(bm // 8)
        t0 = time.perf_counter()
        for v in vals[:100_000]:
            d = hashlib.md5(str(v).encode("utf-8")).digest()
            h1 = int.from_bytes(d[:8], "big")
            h2 = int.from_bytes(d[8:16], "big") | 1
            for i in range(bk):
                p = (h1 + i * h2) % bm
                ref[p >> 3] |= 1 << (p & 7)
        scalar_sec = (time.perf_counter() - t0) * 10
        vec_sec = float("inf")
        for _ in range(3):
            bits = np.zeros(bm // 8, dtype=np.uint8)
            t0 = time.perf_counter()
            tm._bloom_set_bits(bits, vals, bm, bk)
            vec_sec = min(vec_sec, time.perf_counter() - t0)
        check = np.zeros(bm // 8, dtype=np.uint8)
        tm._bloom_set_bits(check, vals[:100_000], bm, bk)
        assert bytes(check) == bytes(ref), "vectorized build diverged"
        rec = {
            "probe": "build_1m", "m_bits": bm, "k": bk,
            "scalar_est_sec_per_1m": round(scalar_sec, 2),
            "vectorized_sec_per_1m": round(vec_sec, 3),
            "speedup": round(scalar_sec / vec_sec, 1),
            "bit_identical_100k": True,
        }
        print(json.dumps(rec))
        results.append(rec)

        summary = {
            "probe": "summary",
            "table_files": N_FILES,
            "table_bitmap_bytes": table_bytes,
            "max_driver_bytes_any_path": max(
                r.get("driver_bitmap_bytes_cached", 0)
                for r in results),
            "calibration": _calibration(),
        }
        print(json.dumps(summary))
        results.append(summary)
        if out_path:
            Path(out_path).write_text(
                "\n".join(json.dumps(r) for r in results) + "\n"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
