"""Unit + idempotency tests for the lookup/ER steps (01/03/06/07/10/11/
14/15/18/19/22/23). Idempotency is the reference's own correctness
mechanism (SURVEY §5): every step re-run on its own output must be a
no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    parse_dr_scores,
    step01_merge_and_retain,
    step03_title_features,
    step06_contributors,
    step07_vetted_mappings,
    step10_genres,
    step11_genre_enrich,
    step14_releasetype,
    step18_mbids,
    step19_album_dr,
    step23_retire_synthetic,
    synthetic_mbid,
)
from tagminder_spark.pipeline.steps_contrib import normalize_contributor_cell

D = "\\\\"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def assert_idempotent(step, df):
    once = step(df)
    twice = step(once)
    assert _rows(once) == _rows(twice)


def test_step03_feature_extraction(spark):
    df = spark.createDataFrame(
        [
            ("p1", "Song (feat. Guest)", "Artist", None, "0"),
            ("p2", "Song (Live at Venue)", "Artist", None, "0"),
            ("p3", "Song (Remastered)", "A", "[Remastered]", "0"),
            ("p4", "Plain", "a feat. b", None, "0"),
        ],
        "__path string, title string, artist string, subtitle string, live string",
    )
    out = {r["__path"]: r for r in step03_title_features(df).collect()}
    assert out["p1"]["title"] == "Song"
    assert out["p1"]["artist"] == f"Artist{D}Guest"
    assert out["p2"]["subtitle"] == "[Live at Venue]"
    assert out["p2"]["live"] == "1"
    assert out["p3"]["subtitle"] == "[Remastered]"  # dedup hit
    assert out["p4"]["artist"] == f"a{D}b"


def test_step07_idempotent(spark):
    m = {"old a": "New A", "old b": "New B"}
    df = spark.createDataFrame(
        [("p1", f"old a{D}keep{D}old b"), ("p2", "old a"), ("p3", None)],
        "__path string, artist string",
    )
    step = lambda d: step07_vetted_mappings(d, m, cols=("artist",))  # noqa: E731
    out = {r["__path"]: r["artist"] for r in step(df).collect()}
    assert out["p1"] == f"New A{D}keep{D}New B"
    assert out["p2"] == "New A"
    assert out["p3"] is None
    assert_idempotent(step, df)


def test_step14_idempotent(spark):
    df = spark.createDataFrame(
        [
            ("p1", "/m/a", "Album", "Rock", "0"),
            ("p2", "/m/a", None, "Rock", "0"),
            ("p3", "/m/OST1", None, "Classical", "0"),
            ("p4", "/m/b", "compilation", "Rock", "1"),
        ],
        "__path string, __dirpath string, releasetype string, genre string,"
        " isgreatesthits string",
    )
    out = {r["__path"]: r["releasetype"] for r in step14_releasetype(df).collect()}
    assert out["p1"] == "Studio Album"
    assert out["p2"] == "Single"
    assert out["p3"] == "Soundtrack"
    assert out["p4"] == "Greatest Hits & Anthologies"
    assert_idempotent(step14_releasetype, df)


def test_step10_idempotent(spark):
    vetted = ["Pop/Rock", "Heavy Metal"]
    df = spark.createDataFrame(
        [("p1", f"rock{D}metal{D}junk"), ("p2", None)],
        "__path string, genre string",
    )
    step = lambda d: step10_genres(d, vetted, cols=("genre",))  # noqa: E731
    out = {r["__path"]: r["genre"] for r in step(df).collect()}
    assert out["p1"] == f"Pop/Rock{D}Heavy Metal"
    assert out["p2"] is None
    assert_idempotent(step, df)


def test_step06_splitter_semantics():
    refs = {
        "john smith": "John Smith",
        "20/20": "20/20",
        "simon": "Simon",
        "garfunkel": "Garfunkel",
        "fathers & sons": "Fathers & Sons",
    }
    f = lambda s: normalize_contributor_cell(s, refs)  # noqa: E731
    assert f("john smith") == "John Smith"
    assert f("simon & garfunkel") == f"Simon{D}Garfunkel"
    assert f("fathers & sons") == "Fathers & Sons"
    assert f("20/20") == "20/20"
    assert f("a/b") == f"A{D}B"
    assert f("ac-dc") == "ac-dc"
    assert f("smith, jr.") == "Smith, Jr."
    assert f("alice, bob") == f"Alice{D}Bob"
    assert f(None) is None
    assert f("  ") is None
    # idempotency at the cell level
    for v in ("john smith", "simon & garfunkel", "a/b", "alice, bob"):
        once = f(v)
        assert f(once) == once


def test_step18_then_23_roundtrip(spark):
    """Unknown name gets a synthetic id; once the dimension learns the
    name, step 23 swaps exactly that slot to the real MBID."""
    alib = spark.createDataFrame(
        [("p1", f"Known{D}Newcomer", "Ctx", None)],
        "__path string, artist string, albumartist string,"
        " musicbrainz_artistid string",
    )
    dis = spark.createDataFrame([("Known", "mb-known")], "norm_name string, mbid string")
    populated = step18_mbids(alib, dis)
    ids = populated.collect()[0]["musicbrainz_artistid"].split(D)
    assert ids[0] == "mb-known"
    syn = populated.select(
        synthetic_mbid(F.lit("Newcomer")).alias("s")
    ).collect()[0]["s"]
    assert ids[1] == syn
    assert ids[1][14] == "3" and ids[1][19] == "8"  # v3 layout markers

    dis2 = spark.createDataFrame(
        [("Known", "mb-known"), ("Newcomer", "mb-new")],
        "norm_name string, mbid string",
    )
    retired = step23_retire_synthetic(populated, dis2)
    ids2 = retired.collect()[0]["musicbrainz_artistid"].split(D)
    assert ids2 == ["mb-known", "mb-new"]
    # real ids never rewritten
    again = step23_retire_synthetic(retired, dis2)
    assert again.collect()[0]["musicbrainz_artistid"] == f"mb-known{D}mb-new"


def test_step19_idempotent(spark):
    raw = spark.createDataFrame(
        [("/m/a|DR12",), ("bad line",), ("/m/b|DRx",)], "value string"
    )
    dr = parse_dr_scores(raw)
    assert _rows(dr) == [("/m/a", "12")]
    alib = spark.createDataFrame(
        [("p1", "/m/a", None), ("p2", "/m/b", "7")],
        "__path string, __dirpath string, album_dr string",
    )
    step = lambda d: step19_album_dr(d, dr)  # noqa: E731
    out = {r["__path"]: r["album_dr"] for r in step(alib).collect()}
    assert out["p1"] == "12"
    assert out["p2"] == "7"
    assert_idempotent(step, alib)


def test_step01_retention_and_fanout(spark):
    df = spark.createDataFrame(
        [
            ("p1", "Ann, MainArtist", None, "x", "words", None, None),
        ],
        "__path string, involvedpeople string, albumartist string,"
        " badcol string, unsyncedlyrics string, lyrics string,"
        " itunesadvisory string",
    )
    out = step01_merge_and_retain(
        df, keep=("involvedpeople", "albumartist", "lyrics", "unsyncedlyrics")
    ).collect()[0]
    assert out["albumartist"] == "Ann"
    assert out["badcol"] is None
    assert out["lyrics"] == "words"
    assert out["unsyncedlyrics"] is None


def test_step11_merge_rules(spark):
    ref = spark.createDataFrame(
        [("m1", '["G1","G2"]', None), ("m2", "notjson", '["S1"]')],
        "mbid string, allmusic_genres_json string, allmusic_styles_json string",
    )
    from tagminder_spark.pipeline import parse_genre_norms

    norms = parse_genre_norms(ref)
    alib = spark.createDataFrame(
        [
            ("p1", "m1", None, "St"),
            ("p2", "m2", "G0", None),
            ("p3", "mX", "G0", "St"),
        ],
        "__path string, musicbrainz_artistid string, genre string, style string",
    )
    out = {r["__path"]: r for r in step11_genre_enrich(alib, norms).collect()}
    assert out["p1"]["genre"] == f"G1{D}G2"
    assert out["p2"]["genre"] == "G0"  # malformed json ⇒ no ref
    assert out["p2"]["style"] == "S1"
    assert out["p3"]["genre"] == "G0"  # no dim match
