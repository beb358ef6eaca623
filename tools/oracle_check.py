"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash.
Stricter than the driver on values (exact string equality after canonical
formatting) so anything passing here should pass the gate.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tagminder_spark.session import TABLES, get_spark  # noqa: E402


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Heavy oracles (recursive-CTE closures at sf1) can spill tens of GB;
    # pin the spill to a dedicated dir with a bounded size so a runaway
    # oracle fails ITS OWN query instead of filling the filesystem for
    # every process on the box (which is how the first sf1 sweep died).
    tmp = Path(__file__).resolve().parent.parent / ".tmp" / "duckdb_spill"
    tmp.mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def check(sf_dir: str, only: list[str] | None = None) -> bool:
    import __spark_entry__ as entry

    spark = get_spark("oracle_check")
    from tagminder_spark.session import load_tables

    load_tables(spark, sf_dir)
    con = duckdb_conn(sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    ok = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            ok = False
            continue
        if name not in oracles:
            print(f"pass {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            ok = False
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
            continue
        cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
        if cs != cd:
            diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            ok = False
            continue
        print(f"PASS {name}: rows={len(s_rows)}")
    return ok


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    sys.exit(0 if check(sf, only) else 1)
