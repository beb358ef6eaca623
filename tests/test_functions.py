"""Unit tests for the shared expression library (SURVEY.md §2.2/§2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagminder_spark.functions import (
    album_root,
    blank_to_null,
    decade,
    epoch_to_ts,
    is_blank,
    md5_invalid,
    mv_join,
    mv_tokens,
    normalize_date,
    normalize_year,
    truthy,
)


def _vals(spark, expr, rows, colname="v"):
    df = spark.createDataFrame([(r,) for r in rows], [colname])
    return [r[0] for r in df.select(expr).collect()]


def test_is_blank(spark):
    got = _vals(spark, is_blank("v"), [None, "", "   ", '""', "x", " x "])
    assert got == [True, True, True, True, False, False]


def test_blank_to_null(spark):
    got = _vals(spark, blank_to_null("v"), [None, "", "  ", '""', "keep"])
    assert got == [None, None, None, None, "keep"]


def test_truthy(spark):
    got = _vals(
        spark, truthy("v"), ["1", "true", "Yes", " ON ", "0", "no", "", None]
    )
    assert got == [1, 1, 1, 1, 0, 0, 0, 0]


def test_md5_invalid(spark):
    got = _vals(
        spark,
        md5_invalid("v"),
        [None, "", "0", "0000-0000", "00-00-00", "abc123", "a0b0"],
    )
    assert got == [True, True, True, True, True, False, False]


def test_album_root(spark):
    cases = {
        "/m/Artist/Album/CD1": "/m/Artist/Album",
        "/m/Artist/Album/cd 02": "/m/Artist/Album",
        "/m/Artist/Album/Disc 003": "/m/Artist/Album",
        "/m/Artist/Album/disc12": "/m/Artist/Album",
        "/m/Artist/Album": "/m/Artist/Album",
        "/m/Artist/CDs Forever": "/m/Artist/CDs Forever",
        "/m/Artist/Album/disc1234": "/m/Artist/Album/disc1234",
    }
    got = _vals(spark, album_root("v"), list(cases))
    assert got == list(cases.values())


def test_mv_tokens_order_preserving_dedup(spark):
    raw = "B\\\\ a \\\\A\\\\B\\\\\\\\ \\\\c"
    [toks] = _vals(spark, mv_tokens("v"), [raw])
    assert toks == ["B", "a", "A", "c"]  # first-seen order, blanks dropped


def test_mv_roundtrip(spark):
    [joined] = _vals(spark, mv_join(mv_tokens("v")), ["x\\\\y\\\\x"])
    assert joined == "x\\\\y"
    [empty] = _vals(spark, mv_join(mv_tokens("v")), ["  "])
    assert empty is None


def test_normalize_date_shapes(spark):
    cases = {
        "2001": "2001",
        "2001-05-03": "2001-05-03",
        "20010503": "2001-05-03",
        "2001/05/03": "2001-05-03",
        "2001.05.03": "2001-05-03",
        "2001-05": "2001",
        "garbage": None,
        "01-02-2003": None,
    }
    got = _vals(spark, normalize_date("v"), list(cases))
    assert got == list(cases.values())
    years = _vals(spark, normalize_year("v"), list(cases))
    assert years == ["2001"] * 6 + [None, None]


def test_decade(spark):
    got = _vals(spark, decade("v"), ["1994", "2000", "1989"])
    assert got == [1990, 2000, 1980]


def test_epoch_heuristic(spark):
    secs, millis = 1_600_000_000, 1_600_000_000_000
    got = _vals(spark, epoch_to_ts("v").cast("long"), [secs, millis])
    assert got == [secs, secs]
