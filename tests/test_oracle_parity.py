"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's correctness gate (exact value compare)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tools.oracle_check import _canon_rows

import __spark_entry__ as entry

_QUERIES, _ORACLES = entry.queries(), entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in _ORACLES:
        pytest.skip(f"{name}: no oracle (rows-only check); rows={len(s_rows)}")
    res = duck.execute(_ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _canon_rows(s_cols, s_rows) == _canon_rows(d_cols, d_rows)


def test_g_feature_edges_not_vacuous(spark):
    """Round-2 verdict: the fixed 2..50 DF window excluded every feature
    at small SF, turning the gate green on 0 rows. The corpus-scaled
    bound must admit features — assert the gate proves something."""
    from tagminder_spark.queries.reports import g_feature_edges

    assert g_feature_edges(spark, SF_DIR).count() > 0


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns


def test_every_query_has_docstring():
    for name, fn in _QUERIES.items():
        assert fn.__doc__, f"{name} lacks a docstring"
