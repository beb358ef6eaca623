"""Sweep every oracle for output-TYPE mismatches vs the Spark query.

The driver's value hash is type-sensitive (round-1 evidence: three
`SUM(CASE ...)` oracles returned DuckDB HUGEINT vs Spark BIGINT and
hash-mismatched while values were identical).  This tool runs each oracle
on DuckDB, each query on Spark (sf0.001), and diffs the per-column types
after mapping both to a common lattice.  Any mismatch is a latent
hash-mismatch at the gate.

Usage: python tools/type_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tagminder_spark.session import TABLES, get_spark  # noqa: E402

# DuckDB type -> canonical
_DUCK = {
    "HUGEINT": "int128",
    "BIGINT": "int64",
    "INTEGER": "int32",
    "SMALLINT": "int16",
    "TINYINT": "int8",
    "UBIGINT": "uint64",
    "DOUBLE": "float64",
    "FLOAT": "float32",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BLOB": "binary",
}

# Spark simpleString -> canonical
_SPARK = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "binary",
}


def _duck_canon(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t.lower()
    if t.startswith("STRUCT") or t.endswith("[]"):
        return "complex"
    return _DUCK.get(t, t.lower())


def _spark_canon(t: str) -> str:
    if t.startswith("decimal"):
        return t
    if t.startswith(("array", "struct", "map")):
        return "complex"
    return _SPARK.get(t, t)


def main(sf_dir: str) -> int:
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("type_sweep")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    bad = 0
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        try:
            df = queries[name](spark, sf_dir)
            spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            bad += 1
            continue
        if sorted(duck_types) != sorted(spark_types):
            print(f"{name}: COLUMN MISMATCH duck={sorted(duck_types)} spark={sorted(spark_types)}")
            bad += 1
            continue
        diffs = []
        for c in duck_types:
            d, s = _duck_canon(duck_types[c]), _spark_canon(spark_types[c])
            if d != s:
                diffs.append(f"{c}: duck={duck_types[c]}({d}) spark={spark_types[c]}({s})")
        if diffs:
            print(f"{name}: TYPE MISMATCH  " + "; ".join(diffs))
            bad += 1
    print(f"\n{len(oracles)} oracles checked, {bad} with mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
