"""SQL function registration — parity with the reference's SQLite UDF
registration (src/tagminder/core/tm_album.py:49-52 registers album_root /
album_root_from_path for use inside SQL aggregates; tm_changelog.py:97-98
uses them in the changelog summary).

DataFrame code should use the expression library (`functions.core`) —
JVM-side, codegen'd. These registrations exist so `spark.sql("...")`
users get the same vocabulary; they are scalar Python UDFs (the SQL-
registration path cannot carry pure Column expressions), so they are the
slow path by design — same duality the reference keeps (scalar for SQLite
UDF, vectorized Polars expression for frames, tm_album.py:30-87).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_DISC_RE = re.compile(r"/(?:cd|disc)\s*0*\d{1,3}$", re.IGNORECASE)
_MV_DELIM = "\\\\"


def album_root_py(dirpath: str | None) -> str | None:
    """Scalar twin of functions.core.album_root."""
    if dirpath is None:
        return None
    return _DISC_RE.sub("", dirpath)


def album_root_from_path_py(path: str | None) -> str | None:
    if path is None:
        return None
    head, _, _ = path.rpartition("/")
    return album_root_py(head) if head else None


def is_blank_py(v: str | None) -> bool:
    return v is None or v.strip() == "" or v.strip() == '""'


def tokens_py(cell: str | None) -> list[str]:
    """Scalar twin of functions.core.mv_tokens (order-preserving dedup)."""
    if cell is None:
        return []
    toks = [t.strip() for t in cell.split(_MV_DELIM)]
    return list(dict.fromkeys(t for t in toks if t))


def register_sql_functions(spark: SparkSession) -> None:
    """Make the expression vocabulary available to spark.sql() users."""
    spark.udf.register("album_root", album_root_py, T.StringType())
    spark.udf.register(
        "album_root_from_path", album_root_from_path_py, T.StringType()
    )
    spark.udf.register("is_blank", is_blank_py, T.BooleanType())
    spark.udf.register("mv_tokens", tokens_py, T.ArrayType(T.StringType()))
