"""sf1 value evidence for the DEFAULT (corpus-derived) embedding-LSH path.

``d_embedding_lsh_scaled`` is excluded from the fixed-oracle sf1 sweep BY
DESIGN: its registered oracle pins the n=500 gate-corpus derivation, while
at sf1 the operator derives wider bands from the live count — which is the
operator's whole point.  That exclusion still left the scale-safe default
configuration without value evidence at 10x.  This tool closes the gap by
generating the oracle AT the sf1-derived parameters:

1. count the sf1 embeddings (n = 20 000) and compute ``derive_banding(n)``
   exactly as the operator does;
2. run the gate function (true default path — no explicit bits/bands,
   finite ``DEFAULT_MAX_BUCKET`` live) on Spark against sf1;
3. render ``_embedding_lsh_sql(bits, bands)`` — the same SQL generator the
   gate oracle uses, parameterised at the derived banding — and run it on
   DuckDB over the same parquet;
4. compare with oracle_check's canonical order-insensitive row formatting.

A PASS means the default call path is value-exact at 10x the gate corpus,
including that no bucket hits the 256 cap at healthy derived occupancy
(expected ~n/2^r ≈ 10 per band-bucket) — i.e. the cap only bites where
banding has degenerated, as designed.

Usage: python tools/sf1_scaled_lsh_check.py [sf1_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.oracle_check import _canon_rows, duckdb_conn  # noqa: E402


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scaledata" / "sf1"
    )

    import __spark_entry__ as entry
    from tagminder_spark.operators.dedupe import derive_banding
    from tagminder_spark.queries.dedup import _embedding_lsh_sql
    from tagminder_spark.session import get_spark, load_tables

    spark = get_spark("sf1_scaled_lsh_check")
    load_tables(spark, sf1)

    n = spark.read.parquet(f"{sf1}/embeddings.parquet").count()
    bits, bands = derive_banding(n)
    print(f"n={n} -> derived bits={bits} bands={bands} (r={bits // bands})")

    sdf = entry.queries()["d_embedding_lsh_scaled"](spark, sf1)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    print(f"spark rows={len(s_rows)}")

    con = duckdb_conn(sf1)
    res = con.execute(_embedding_lsh_sql(bits, bands))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    print(f"duckdb rows={len(d_rows)}")

    if sorted(s_cols) != sorted(d_cols):
        print(f"FAIL d_embedding_lsh_scaled@sf1: columns "
              f"spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return 1
    if len(s_rows) != len(d_rows):
        print(f"FAIL d_embedding_lsh_scaled@sf1: rowcount "
              f"spark={len(s_rows)} duck={len(d_rows)}")
        return 1
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        print(f"FAIL d_embedding_lsh_scaled@sf1: value mismatch: {diffs}")
        return 1
    print(f"PASS d_embedding_lsh_scaled@sf1: rows={len(s_rows)} "
          f"value-exact at derived banding {bits}/{bands}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
