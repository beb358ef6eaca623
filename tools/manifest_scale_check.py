"""Manifest chain/commit scale probe (round 9, VERDICT r8 #7).

The manifest family's sf0.1→sf1 exponents are flat because DATA volume
is the wrong axis for a metadata layer; the right axes are the ones
this probe measures directly, with synthetic file lists (commits, chain
folds, and checkpoints are pure manifest-level operations — no data
files needed):

1. **append-commit cost vs TABLE SIZE** — must be flat: ``commit_delta``
   writes O(|batch|) bytes and never reads the table.  (The generation
   DISCOVERY — ``list_generations`` — is a directory listing that grows
   with retained manifests, which is what expiry bounds.)
2. **read-time chain-fold cost vs DELTA-CHAIN LENGTH** — linear in
   (chain length × delta size), bounded in production by the
   maintenance/checkpoint cadence.
3. **checkpoint cost vs TABLE FILE COUNT** — one full-list JSON write,
   linear in table files; this is the amortized price of resetting the
   chain.

Output: one JSON line per measurement plus a summary with the
recommended checkpoint cadence; numbers recorded in BASELINE.md §13.

Run: ``python tools/manifest_scale_check.py [out.json]``
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tagminder_spark.operators.table_manifest import (  # noqa: E402
    _fold_cache_clear,
    checkpoint_manifest,
    commit_delta,
    commit_manifest,
    list_generations,
    read_manifest,
)


def _mkfiles(n: int, prefix: str = "lang=en/part") -> list[tuple[str, int]]:
    return [(f"{prefix}-{i:08d}.parquet", 1 << 20) for i in range(n)]


def _bench(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _calibration() -> dict:
    """Same md5 yardstick bench.py embeds — host speed varies
    boot-to-boot, so prune timings must be read against it."""
    import hashlib

    blob = b"x" * (1 << 20)
    t0 = time.perf_counter()
    for _ in range(64):
        hashlib.md5(blob).hexdigest()
    return {"md5_64mib_sec": round(time.perf_counter() - t0, 4)}


def prune_probe(results: dict) -> None:
    """Driver-side prune cost vs file count (VERDICT r10 #5): the
    vectorized path's cold (first read of a generation: numpy packing
    + evaluation) and warm (packed arrays cached per immutable
    generation — the recurring selective-read cost) timings, plus the
    per-file scalar reference, results asserted identical."""
    import random

    from tagminder_spark.operators.table_manifest import (
        _pack_cache_clear,
        prune_manifest,
    )
    import tagminder_spark.operators.table_manifest as tm

    rng = random.Random(11)
    for n in (10_000, 100_000, 800_000):
        files, stats = [], {}
        for i in range(n):
            lang = ("en", "de", "fr", "es")[i % 4]
            rel = f"lang={lang}/part-{i:07d}.parquet"
            files.append([rel, 1 << 20])
            a = rng.randrange(0, 10_000_000)
            stats[rel] = {"doc_id": [a, a + 5000, 0, 2000]}
        files.sort()
        stats = dict(sorted(stats.items()))
        man = {"files": files, "stats": stats, "generation": 1,
               "cache_key": ("probe", n, 0.0)}
        where = [("doc_id", "<=", 200_000)]
        _pack_cache_clear()
        t0 = time.perf_counter()
        r_cold = prune_manifest(man, where)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        r_warm = prune_manifest(man, where)
        warm = time.perf_counter() - t0
        old = tm._VECTOR_PRUNE_THRESHOLD
        tm._VECTOR_PRUNE_THRESHOLD = 10 ** 12
        try:
            t0 = time.perf_counter()
            r_ref = prune_manifest(man, where)
            scalar = time.perf_counter() - t0
        finally:
            tm._VECTOR_PRUNE_THRESHOLD = old
        assert r_cold["files"] == r_warm["files"] == r_ref["files"]
        row = {
            "probe": "prune_manifest",
            "files": n,
            "scalar_sec": round(scalar, 4),
            "vector_cold_sec": round(cold, 4),
            "vector_warm_sec": round(warm, 4),
            "kept": len(r_cold["files"]),
        }
        results["probes"].append(row)
        print(json.dumps(row), flush=True)


def main(out_path: str | None = None) -> dict:
    results: dict = {"probes": [], "calibration": _calibration()}
    print(json.dumps({"calibration": results["calibration"]}), flush=True)
    prune_probe(results)

    # 1) append-commit cost vs table size (batch fixed at 50 files)
    for table_files in (1_000, 10_000, 100_000):
        root = tempfile.mkdtemp(prefix="tm_mscale_")
        try:
            commit_manifest(None, root, _mkfiles(table_files), parent=0)
            batch = _mkfiles(50, prefix="lang=en/new")
            gen = [1]

            def once():
                gen[0] = commit_delta(None, root, batch, parent=gen[0])

            sec = _bench(once)
            row = {
                "probe": "append_commit",
                "table_files": table_files,
                "batch_files": 50,
                "sec": round(sec, 6),
            }
            results["probes"].append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # 2) chain-fold cost vs delta-chain length (base 100k files,
    #    50-file deltas) — the read-time price of skipping checkpoints
    for chain_len in (10, 50, 200):
        root = tempfile.mkdtemp(prefix="tm_mscale_")
        try:
            commit_manifest(None, root, _mkfiles(100_000), parent=0)
            g = 1
            for j in range(chain_len):
                g = commit_delta(
                    None, root, _mkfiles(50, prefix=f"lang=en/b{j}-"),
                    parent=g,
                )
            # cold fold (use_cache=False): the price the fold cache
            # exists to amortize — cached repeat reads measured below
            sec = _bench(
                lambda: read_manifest(None, root, g, use_cache=False)
            )
            row = {
                "probe": "chain_fold",
                "base_files": 100_000,
                "chain_len": chain_len,
                "sec": round(sec, 6),
            }
            results["probes"].append(row)
            print(json.dumps(row), flush=True)

            # round 10 (VERDICT r9 #5): repeat reads through the fold
            # cache must be ~free — one miss, then O(copy) per read
            _fold_cache_clear()
            read_manifest(None, root, g)  # populate
            cached = _bench(lambda: read_manifest(None, root, g))
            row = {
                "probe": "fold_cache_repeat_read",
                "base_files": 100_000,
                "chain_len": chain_len,
                "cold_sec": round(sec, 6),
                "cached_sec": round(cached, 6),
                "speedup": round(sec / max(cached, 1e-9), 1),
            }
            results["probes"].append(row)
            print(json.dumps(row), flush=True)

            t0 = time.perf_counter()
            cg = checkpoint_manifest(None, root)
            cp_sec = time.perf_counter() - t0
            post = _bench(
                lambda: read_manifest(None, root, cg, use_cache=False)
            )
            row = {
                "probe": "checkpoint",
                "table_files": 100_000 + 50 * chain_len,
                "chain_len_collapsed": chain_len,
                "checkpoint_sec": round(cp_sec, 6),
                "post_checkpoint_read_sec": round(post, 6),
            }
            results["probes"].append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # 3) generation discovery vs retained manifest count (what expiry
    #    bounds): list_generations over 10/200 retained manifests
    for n_gens in (10, 200):
        root = tempfile.mkdtemp(prefix="tm_mscale_")
        try:
            g = commit_manifest(None, root, _mkfiles(1_000), parent=0)
            for j in range(n_gens - 1):
                g = commit_delta(None, root, _mkfiles(5, prefix=f"g{j}-"),
                                 parent=g)
            sec = _bench(lambda: list_generations(None, root))
            row = {
                "probe": "list_generations",
                "retained_manifests": n_gens,
                "sec": round(sec, 6),
            }
            results["probes"].append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # summary: recommended cadence = keep read-time fold under ~2x the
    # post-checkpoint read
    by = {
        (p["probe"], p.get("chain_len") or p.get("chain_len_collapsed")):
            p for p in results["probes"]
    }
    folds = {
        k[1]: v["sec"] for k, v in by.items() if k[0] == "chain_fold"
    }
    post = {
        k[1]: v["post_checkpoint_read_sec"]
        for k, v in by.items() if k[0] == "checkpoint"
    }
    rec = None
    for n in sorted(folds):
        if folds[n] <= 2 * post[n]:
            rec = n
    results["summary"] = {
        "fold_sec_by_chain_len": folds,
        "post_checkpoint_read_sec": post,
        "recommended_max_chain_len": rec,
        "note": (
            "checkpoint every maintenance pass (the streaming loop "
            "already does); the recommended_max_chain_len is the "
            "largest probed chain whose fold stays within 2x a "
            "checkpointed read"
        ),
    }
    print(json.dumps(results["summary"]), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
