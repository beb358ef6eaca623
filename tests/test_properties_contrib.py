"""Property tests (hypothesis) for the pure cell-level engines: the
3-stage contributor splitter and the multi-value scalar codec — SURVEY §5
plan item 4 (property tests for the pure UDFs)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tagminder_spark.functions.sqlreg import tokens_py
from tagminder_spark.pipeline.steps_contrib import normalize_contributor_cell

D = "\\\\"

_REFS = {
    "john smith": "John Smith",
    "jane doe": "Jane Doe",
    "20/20": "20/20",
    "simon": "Simon",
    "garfunkel": "Garfunkel",
    "fathers & sons": "Fathers & Sons",
}

# Printable-ish text including the split characters. The full two-char
# delimiter is exercised via explicit `D` insertion below; a LONE
# backslash inside a name is excluded by design — it collides with the
# two-backslash delimiter on re-encode, an ambiguity inherited from the
# reference's own cell encoding (tags2db.py:108-121), not a bug here.
name_text = st.text(alphabet=st.sampled_from(list("abcXYZ 012,;/&-.'")), max_size=20)
cells = st.builds(lambda parts: D.join(parts), st.lists(name_text, max_size=3))


@settings(max_examples=300, deadline=None)
@given(cells)
def test_splitter_never_crashes_and_is_idempotent(s):
    once = normalize_contributor_cell(s, _REFS)
    if once is None:
        return
    # output is never blank, never has leading/trailing token whitespace
    toks = once.split(D)
    assert all(t == t.strip() and t for t in toks)
    # idempotency: normalizing the normalized cell is a no-op
    assert normalize_contributor_cell(once, _REFS) == once


@settings(max_examples=300, deadline=None)
@given(cells)
def test_splitter_dict_hits_are_canonical(s):
    out = normalize_contributor_cell(s, _REFS)
    if out is None:
        return
    canon = set(_REFS.values())
    for tok in out.split(D):
        if tok.lower() in _REFS:
            assert _REFS[tok.lower()] in canon
            assert tok == _REFS[tok.lower()] or tok.lower() not in _REFS


@settings(max_examples=300, deadline=None)
@given(cells)
def test_tokens_codec_properties(s):
    toks = tokens_py(s)
    # no blanks, no duplicates, order-preserving dedup
    assert all(t for t in toks)
    assert len(toks) == len(set(toks))
    # re-encoding then re-tokenizing is stable
    assert tokens_py(D.join(toks)) == toks


# ---------------------------------------------------------------------------
# date normalization invariants (Spark-side, sampled batch)
# ---------------------------------------------------------------------------

date_tokens = st.one_of(
    st.from_regex(r"[0-9]{4}", fullmatch=True),
    st.from_regex(r"[0-9]{8}", fullmatch=True),
    st.from_regex(r"[0-9]{4}[-/.][0-9]{2}[-/.][0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{4}-[0-9]{2}", fullmatch=True),
    st.text(alphabet=st.sampled_from(list("0123456789-/.xY ")), max_size=12),
)


@settings(max_examples=1, deadline=None)
@given(st.lists(date_tokens, min_size=50, max_size=50))
def test_normalize_date_invariants(spark, tokens):
    """Output is NULL or canonical (YYYY / YYYY-MM-DD), and the
    normalizer is idempotent — one Spark job over a hypothesis batch."""
    import re

    from pyspark.sql import functions as F

    from tagminder_spark.functions.dates import normalize_date

    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    rows = df.select(
        "tok",
        normalize_date(F.col("tok")).alias("once"),
        normalize_date(normalize_date(F.col("tok"))).alias("twice"),
    ).collect()
    canon = re.compile(r"^\d{4}(-\d{2}-\d{2})?$")
    for r in rows:
        if r["once"] is not None:
            assert canon.match(r["once"]), (r["tok"], r["once"])
        assert r["once"] == r["twice"], (r["tok"], r["once"], r["twice"])


def test_windowed_steps_idempotent(spark):
    """Steps 05/12/13 (windowed/grouped) re-run on their own output are
    no-ops — the convergence guarantee for the group-based family."""
    from tagminder_spark.pipeline import (
        step05_infer_composers,
        step12_compilations,
        step13_discnumber,
    )

    alib = spark.createDataFrame(
        [
            ("p1", "/m/a", "T1", "A1", "C1", None, "1", "0"),
            ("p2", "/m/a", "T1", "A1", None, "various", "1", "0"),
            ("p3", "/m/b/cd1", "T2", "A2", None, "A2", "2", "0"),
        ],
        "__path string, __dirpath string, title string, artist string,"
        " composer string, albumartist string, discnumber string, compilation string",
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for step in (step05_infer_composers, step12_compilations, step13_discnumber):
        once = step(alib)
        assert rows(step(once)) == rows(once), step.__name__
        alib = once
