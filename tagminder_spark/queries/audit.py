"""Diff-audit queries — the reference's signature change-capture protocol
(SURVEY.md §2.10) exercised end-to-end with a DuckDB oracle.

The scenario: a pipeline step normalizes two orders columns
(priority prefix stripped, status code expanded). ``diff_audit`` joins
before/after, emits changelog rows for fields that actually changed after
blank-normalization, and increments ``__sqlmodded`` per changed field —
one operator serving all 23 reference steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.operators.diff_audit import diff_audit
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _old_new(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    old = o.select(
        "o_orderkey",
        F.col("o_orderpriority").cast("string").alias("priority"),
        F.col("o_orderstatus").cast("string").alias("status"),
    )
    new = old.select(
        "o_orderkey",
        F.regexp_replace("priority", "^[0-9]+-", "").alias("priority"),
        F.when(F.col("status") == "P", F.lit("PENDING"))
        .otherwise(F.col("status"))
        .alias("status"),
    )
    return old, new


_CHANGELOG_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderpriority AS priority, o_orderstatus AS status FROM orders
), new AS (
  SELECT o_orderkey,
         regexp_replace(priority, '^[0-9]+-', '') AS priority,
         CASE WHEN status = 'P' THEN 'PENDING' ELSE status END AS status
  FROM old
)
SELECT CAST(o.o_orderkey AS VARCHAR) AS alib_path,
       'priority' AS alib_column,
       o.priority AS old_value, n.priority AS new_value,
       'normalize-orders' AS script
FROM old o JOIN new n USING (o_orderkey)
WHERE o.priority IS DISTINCT FROM n.priority
UNION ALL
SELECT CAST(o.o_orderkey AS VARCHAR), 'status', o.status, n.status,
       'normalize-orders'
FROM old o JOIN new n USING (o_orderkey)
WHERE o.status IS DISTINCT FROM n.status
"""


@q("c_diff_changelog", _CHANGELOG_SQL)
def c_diff_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog emission: one row per actually-changed field, in the
    reference's changelog shape (tm_db.py:142-151) — 'only log what
    actually changed' (tm_changes.py:1-16)."""
    old, new = _old_new(spark, sf_dir)
    _, changelog = diff_audit(
        old, new, "o_orderkey", ["priority", "status"], script="normalize-orders"
    )
    return changelog


_UPDATED_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderpriority AS priority, o_orderstatus AS status FROM orders
), new AS (
  SELECT o_orderkey,
         regexp_replace(priority, '^[0-9]+-', '') AS priority,
         CASE WHEN status = 'P' THEN 'PENDING' ELSE status END AS status
  FROM old
)
SELECT n.o_orderkey, n.priority, n.status,
       CAST((CASE WHEN o.priority IS DISTINCT FROM n.priority THEN 1 ELSE 0 END)
          + (CASE WHEN o.status IS DISTINCT FROM n.status THEN 1 ELSE 0 END)
          AS SMALLINT) AS __sqlmodded
FROM old o JOIN new n USING (o_orderkey)
WHERE o.priority IS DISTINCT FROM n.priority
   OR o.status IS DISTINCT FROM n.status
"""


@q("c_diff_updated", _UPDATED_SQL)
def c_diff_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-only-changed-rows half of the protocol: changed rows with
    ``__sqlmodded`` incremented by the changed-field count
    (tags2db.py:382-393 dirty-row counter)."""
    old, new = _old_new(spark, sf_dir)
    updated, _ = diff_audit(
        old, new, "o_orderkey", ["priority", "status"], script="normalize-orders"
    )
    return updated.select("o_orderkey", "priority", "status", "__sqlmodded")
