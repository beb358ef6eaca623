"""Golden-output tests for pipeline steps over a synthetic alib fixture
(FIXTURES.md §1 shapes), plus the §2.10 protocol integration via run_step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    run_step,
    step02_clean_text,
    step04_merge_writers,
    step05_infer_composers,
    step08_subtitles,
    step09_live_markers,
    step12_compilations,
    step13_discnumber,
    step16_track_uuid,
    step17_dedupe_tags,
    step20_dates,
    step21_titlecase,
)

D = "\\\\"  # storage delimiter (two literal backslashes)


def _alib(spark, rows, cols):
    schema = ", ".join(f"`{c}` string" for c in ["__path", *cols])
    return spark.createDataFrame(rows, schema)


def _one(df, col):
    return df.select(col).collect()[0][0]


def test_step02_clean_text(spark):
    df = _alib(
        spark,
        [
            ("p1", "Song\r\n", " x "),
            ("p2", "â€™", ""),
            ("p3", None, "ok"),
        ],
        ["title", "artist"],
    )
    out = {r["__path"]: (r.title, r.artist) for r in step02_clean_text(df).collect()}
    assert out["p1"] == ("Song", "x")
    assert out["p2"] == ("'", None)
    assert out["p3"] == (None, "ok")


def test_step04_merge_ordered_caseless(spark):
    df = _alib(
        spark,
        [("p1", f"Bob Dylan{D}neil young", "NEIL YOUNG", None, f"Joni Mitchell{D}bob dylan")],
        ["composer", "arranger", "lyricist", "writer"],
    )
    got = _one(step04_merge_writers(df), "composer")
    # first-seen spelling wins, case-insensitive dedup, order preserved
    assert got == f"Bob Dylan{D}neil young{D}Joni Mitchell"


def test_step05_majority_vote_fill(spark):
    rows = [
        ("p1", "Hey Jude", "The Beatles", "Lennon-McCartney"),
        ("p2", "hey jude", "The Beatles", "Lennon-McCartney"),
        ("p3", "Hey Jude", "The Beatles", "P. McCartney"),
        ("p4", "Hey Jude", "The Beatles", None),  # ← fill target
        ("p5", "Hey Jude", f"The Beatles{D}Wings", None),  # multi-artist: skip
        ("p6", "Other Song", "The Beatles", ""),  # no votes: stays blank
    ]
    df = _alib(spark, rows, ["title", "artist", "composer"])
    out = {r["__path"]: r.composer for r in step05_infer_composers(df).collect()}
    assert out["p4"] == "Lennon-McCartney"
    assert out["p5"] is None
    assert out["p6"] == ""


def test_step08_subtitles(spark):
    df = _alib(
        spark,
        [
            ("p1", "Song [Live at Leeds] [Remastered]", None),
            ("p2", "Plain Song", "Existing"),
            ("p3", "Tune [Acoustic]", f"Old{D}acoustic"),
        ],
        ["title", "subtitle"],
    )
    out = {r["__path"]: (r.title, r.subtitle) for r in step08_subtitles(df).collect()}
    assert out["p1"] == ("Song", "Live at Leeds; Remastered")
    assert out["p2"] == ("Plain Song", "Existing")
    assert out["p3"] == ("Tune", "Old; acoustic")  # caseless dedup kept first


def test_step09_live_markers(spark):
    rows = [
        ("p1", "Song (Live)", None, "Album - live", "0"),
        ("p2", "Quiet Song", None, "Studio Album", "0"),
        ("p3", "Track [live]", "Live in Paris", "X", "1"),
    ]
    df = _alib(spark, rows, ["title", "subtitle", "album", "live"])
    out = {
        r["__path"]: (r.title, r.album, r.subtitle, r.live)
        for r in step09_live_markers(df).collect()
    }
    assert out["p1"] == ("Song", "Album", "[Live]", "1")
    assert out["p2"] == ("Quiet Song", "Studio Album", None, "0")
    assert out["p3"] == ("Track", "X", "Live in Paris", "1")  # already marked


def test_step12_compilations(spark):
    rows = [
        ("a1", "/m/VA - Hits", "Artist A", None, "0"),
        ("a2", "/m/VA - Hits", "Artist B", None, "0"),
        ("b1", "/m/Solo", "One Artist", "", "0"),
        ("b2", "/m/Solo", "One Artist", None, "0"),
        ("c1", "/m/Mixed", "X", "various", "0"),
        ("c2", "/m/Mixed", "Y", "Various Artists", "0"),
        ("d1", "/m/OST - Movie", "Z", "Keep Me", "0"),
    ]
    df = _alib(spark, rows, ["__dirpath", "artist", "albumartist", "compilation"])
    out = {
        r["__path"]: (r.albumartist, r.compilation)
        for r in step12_compilations(df).collect()
    }
    assert out["a1"] == ("Various Artists", "1")  # rule 1
    assert out["b1"] == ("One Artist", "0")  # rule 2
    assert out["c1"] == ("Various Artists", "1")  # rule 3
    assert out["d1"] == ("Keep Me", "1")  # path rule


def test_step13_discnumber(spark):
    rows = [
        ("a1", "/m/Album", "1"),
        ("a2", "/m/Album", "1"),  # constant, not disc folder → clear
        ("b1", "/m/Box/CD1", "1"),
        ("b2", "/m/Box/CD1", "1"),  # disc folder → keep
        ("c1", "/m/Two", "1"),
        ("c2", "/m/Two", "2"),  # varying → keep
    ]
    df = _alib(spark, rows, ["__dirpath", "discnumber"])
    out = {r["__path"]: r.discnumber for r in step13_discnumber(df).collect()}
    assert out["a1"] is None and out["a2"] is None
    assert out["b1"] == "1" and out["c2"] == "2"


def test_step16_track_uuid(spark):
    import re

    v4 = "123e4567-e89b-42d3-a456-426614174000"
    v7 = "01890a5d-ac96-774b-bcce-b302099a8057"
    df = _alib(spark, [("p1", None), ("p2", v4), ("p3", v7)], ["track_uuid"])
    out = {r["__path"]: r.track_uuid for r in step16_track_uuid(df).collect()}
    uuid7_re = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert uuid7_re.match(out["p1"])
    assert uuid7_re.match(out["p2"])  # v4 replaced
    assert out["p3"] == v7  # already v7: untouched


def test_step17_dedupe_tags(spark):
    df = _alib(spark, [("p1", f"Rock{D}rock{D} Rock {D}Jazz")], ["genre"])
    # NOTE: mv dedup is case-sensitive (reference semantics); 'Rock' dedups
    # with ' Rock ' after trim but not with 'rock'.
    assert _one(step17_dedupe_tags(df, ("genre",)), "genre") == f"Rock{D}rock{D}Jazz"


def test_step20_dates(spark):
    df = _alib(
        spark,
        [("p1", f"1999{D}1999-02-01{D}junk"), ("p2", "20010503"), ("p3", "bad")],
        ["year"],
    )
    out = {r["__path"]: r.year for r in step20_dates(df, ("year",)).collect()}
    assert out["p1"] == f"1999{D}1999-02-01"
    assert out["p2"] == "2001-05-03"
    assert out["p3"] is None


def test_step21_titlecase(spark):
    df = _alib(
        spark,
        [("p1", "the long and winding road", None)],
        ["title", "subtitle"],
    )
    assert (
        _one(step21_titlecase(df, ("title",)), "title")
        == "The Long and Winding Road"
    )


def test_run_step_protocol(spark):
    """Integration: step + diff-audit → changelog + __sqlmodded (§2.10)."""
    df = _alib(
        spark,
        [("p1", "Song\r\n", "ok"), ("p2", "Clean", "fine")],
        ["title", "artist"],
    )
    updated, changelog = run_step(
        df, step02_clean_text, ["title", "artist"], "02-clean-text", key="__path"
    )
    ch = changelog.collect()
    assert len(ch) == 1
    assert ch[0].alib_path == "p1" and ch[0].new_value == "Song"
    assert ch[0].script == "02-clean-text"
    up = updated.collect()
    assert len(up) == 1 and up[0]["__sqlmodded"] == 1
    # idempotency: re-running on the updated frame yields zero changes
    updated2, changelog2 = run_step(
        step02_clean_text(df), step02_clean_text, ["title", "artist"], "02"
    )
    assert changelog2.count() == 0
