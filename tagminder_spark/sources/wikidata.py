"""Wikidata JSON-dump claim helpers (SURVEY §2.1 S15 deep form).

Reference: scripts/mdm/harvest/harvest_wikimedia.py —
``_truthy_statements`` (:198-217): per property, statements ranked
``deprecated`` are dropped and the ``preferred`` list replaces the
``normal`` list whenever it is non-empty; ``_first_truthy_text`` /
``_first_truthy_qid`` (:266-288) then take the first surviving value in
statement order.

Spark shape: pure higher-order functions over the parsed claim array —
``filter``/``size``/``try_element_at`` — so truthy selection runs inside
codegen on every entity row with no UDF and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark-side schema of one claim statement as this engine models it:
#: the (rank, value) pair after datavalue flattening.
CLAIM_SCHEMA = "array<struct<rank:string,value:string>>"


def truthy_statements(claims: Column) -> Column:
    """The rank gate (:198-217): drop ``deprecated``; if any
    ``preferred`` statements survive they replace the ``normal`` list."""
    kept = F.filter(claims, lambda s: s["rank"].isNotNull() & (s["rank"] != "deprecated"))
    preferred = F.filter(kept, lambda s: s["rank"] == "preferred")
    normal = F.filter(kept, lambda s: s["rank"] == "normal")
    return F.when(F.size(preferred) > 0, preferred).otherwise(normal)


def first_truthy_value(claims: Column) -> Column:
    """First truthy value in statement order (:266-272); NULL when no
    statement survives the rank gate (blank values skipped). Values are
    cleaned with the reference's ``str.strip()`` whitespace set (shared
    codepoint list with the MB member parsers), not ASCII-space trim."""
    from tagminder_spark.sources.mbdump import _PY_WS

    strip = lambda c: F.btrim(c, F.lit(_PY_WS))  # noqa: E731
    vals = F.filter(
        truthy_statements(claims),
        lambda s: s["value"].isNotNull() & (strip(s["value"]) != ""),
    )
    return F.try_element_at(F.transform(vals, lambda s: strip(s["value"])), F.lit(1))
