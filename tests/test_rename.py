"""Rename planner/sink golden tests (98-rename-files-and-folders.py).

Each case pins one ported behavior against hand-computed expectations
from the reference's Python functions.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from tagminder_spark.operators.rename import (
    apply_renames,
    rename_plan,
    update_paths_after_rename,
)

COLS = (
    "__path __dirpath __filename compilation discnumber track artist title "
    "albumartist album year __bitspersample __frequency_num"
).split()


def _alib(spark, rows):
    return spark.createDataFrame(
        [tuple(r.get(c) for c in COLS) for r in rows],
        ", ".join(f"`{c}` string" for c in COLS),
    )


def _row(path, **kw):
    d = {
        "__path": path,
        "__dirpath": path.rsplit("/", 1)[0],
        "__filename": path.rsplit("/", 1)[1],
        "compilation": "0",
        "discnumber": "",
        "track": "1",
        "artist": "Artist",
        "title": "Title",
        "albumartist": "Band",
        "album": "Album",
        "year": "1999",
        "__bitspersample": "16",
        "__frequency_num": "44.1",
    }
    d.update(kw)
    return d


def _plan_map(spark, rows, **kw):
    plan = rename_plan(_alib(spark, rows), **kw).collect()
    return {r["__path"]: r.asDict() for r in plan}


def test_filename_and_dirname_va(spark):
    rows = [
        _row(
            "/m/olddir/a.flac", compilation="1", track="3", artist="Ar/tist",
            title="So*ng", album="Comp: Hits", year="rel. 2004-01",
        ),
        _row(
            "/m/olddir/b.flac", compilation="1", track="12", artist="B",
            title="Other", album="Comp: Hits", year="rel. 2004-01",
        ),
    ]
    m = _plan_map(spark, rows, include_year=True)
    # zero_pad to 2 digits; sanitized artist 'Ar-tist', title 'Song'
    assert m["/m/olddir/a.flac"]["new_filename"] == "03 - Ar-tist - Song.flac"
    # VA - {year} {album}, ':' -> '-'
    assert m["/m/olddir/a.flac"]["new_dirname"] == "VA - 2004 - Comp- Hits"
    assert m["/m/olddir/a.flac"]["new_path"] == (
        "/m/VA - 2004 - Comp- Hits/03 - Ar-tist - Song.flac"
    )
    assert m["/m/olddir/a.flac"]["action"] == "rename"


def test_cdn_dirname_and_3digit_pad(spark):
    rows = [
        _row("/m/d/a.mp3", discnumber="2", track="5", title="X"),
        _row("/m/d/b.mp3", discnumber="2", track="140", title="Y"),
    ]
    m = _plan_map(spark, rows)
    # consistent discnumber -> cd2; max track 140 -> 3-digit pad
    assert m["/m/d/a.mp3"]["new_dirname"] == "cd2"
    assert m["/m/d/a.mp3"]["new_filename"] == "2-005 - X.mp3"
    assert m["/m/d/b.mp3"]["new_filename"] == "2-140 - Y.mp3"


def test_albumartist_dirname_strips_mv_delim(spark):
    rows = [
        _row("/m/d/a.mp3", albumartist="A\\\\B", album="Al", year="2010", track="1"),
        _row("/m/d/b.mp3", albumartist="", album="Al", year="2010", track="2"),
    ]
    m = _plan_map(spark, rows, include_year=True)
    assert m["/m/d/a.mp3"]["new_dirname"] == "AB - 2010 - Al"


def test_quality_suffix_and_mixed_res(spark):
    hi = [
        _row("/m/h/a.flac", __bitspersample="24", __frequency_num="96.0", track="1"),
        _row("/m/h/b.flac", __bitspersample="24", __frequency_num="96.0", track="2"),
    ]
    m = _plan_map(spark, hi)
    assert m["/m/h/a.flac"]["new_dirname"].endswith(" [2496.0 kHz]")
    mixed = [
        _row("/m/x/a.flac", __bitspersample="24", __frequency_num="96.0", track="1"),
        _row("/m/x/b.flac", __bitspersample="32", __frequency_num="192.0", track="2"),
    ]
    m = _plan_map(spark, mixed)
    assert m["/m/x/a.flac"]["new_dirname"].endswith(" [Mixed Res]")


def test_nonnumeric_track_passthrough_and_skip_empty(spark):
    rows = [
        _row("/m/d/a.mp3", track="A1", title="T"),
        _row("/m/d/b.mp3", track="2", title=""),
    ]
    m = _plan_map(spark, rows)
    assert m["/m/d/a.mp3"]["new_filename"] == "A1 - T.mp3"
    # blank title and blank-track artistless -> name is '02 - .mp3'? No:
    # title blank => base = '02 - ' -> trimmed '02 -' nonblank -> renamed.
    assert m["/m/d/b.mp3"]["new_filename"] == "02 -.mp3"


def test_collision_two_targets_and_live_file(spark):
    # two rows converge on the same new name
    rows = [
        _row("/m/d/a.mp3", track="1", title="Same"),
        _row("/m/d/b.mp3", track="1", title="Same"),
        # c maps onto d's CURRENT name
        _row("/m/d/c.mp3", track="2", title="T"),
        _row("/m/d/02 - T.mp3", track="9", title="Keep"),
    ]
    m = _plan_map(spark, rows)
    assert m["/m/d/a.mp3"]["collision"] == 1
    assert m["/m/d/a.mp3"]["action"] == "skip-collision"
    assert m["/m/d/b.mp3"]["action"] == "skip-collision"
    assert m["/m/d/c.mp3"]["collision"] == 1  # lands on live file
    assert m["/m/d/02 - T.mp3"]["collision"] == 0


def test_noop_when_name_already_correct(spark):
    rows = [_row("/m/d/01 - T.mp3", track="1", title="T", albumartist="", album="", discnumber="")]
    m = _plan_map(spark, rows)
    assert m["/m/d/01 - T.mp3"]["file_changed"] == 0
    assert m["/m/d/01 - T.mp3"]["action"] == "noop"


def test_apply_renames_injected_writer(spark, tmp_path):
    rows = [
        _row("/m/d/a.mp3", track="1", title="T1"),
        _row("/m/d/b.mp3", track="2", title="T2"),
        _row("/m/e/01 - T.mp3", track="1", title="T", albumartist="", album="", discnumber=""),
    ]
    plan = rename_plan(_alib(spark, rows))
    out_dir = str(tmp_path)

    def recorder(it):
        recs = [(r["__path"], r["new_path"]) for r in it]
        if recs:
            with open(os.path.join(out_dir, uuid.uuid4().hex), "w") as f:
                json.dump(recs, f)

    apply_renames(plan, recorder)
    got = []
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as f:
            got.extend(tuple(x) for x in json.load(f))
    # only action == rename rows reach the writer
    assert sorted(p for p, _ in got) == ["/m/d/a.mp3", "/m/d/b.mp3"]


def test_update_paths_after_rename_round_trip(spark):
    rows = [
        _row("/m/d/a.mp3", track="1", title="T1"),
        _row("/m/e/01 - T.mp3", track="1", title="T", albumartist="", album="", discnumber=""),
    ]
    alib = _alib(spark, rows)
    plan = rename_plan(alib)
    changelog = spark.createDataFrame(
        [("/m/d/a.mp3", "title", "Old", "T1", "02-clean")],
        "alib_path string, alib_column string, old_value string, "
        "new_value string, script string",
    )
    alib2, cl2 = update_paths_after_rename(alib, changelog, plan, script="98-rename")
    a = {r["__filename"]: r for r in alib2.collect()}
    renamed = plan.filter(F.col("action") == "rename").collect()[0]
    assert renamed["new_filename"] in a  # system cols rewritten
    assert a[renamed["new_filename"]]["__dirpath"] == renamed["new_dirpath"]
    # untouched row keeps its path
    assert "01 - T.mp3" in a
    cl = cl2.collect()
    # historical row repointed at the new path
    hist = [r for r in cl if r["script"] == "02-clean"]
    assert hist[0]["alib_path"] == renamed["new_path"]
    # explicit rename entries appended (path + dirpath + filename)
    mine = [r for r in cl if r["script"] == "98-rename"]
    assert {r["alib_column"] for r in mine} == {"__path", "__dirpath", "__filename"}
    path_entry = [r for r in mine if r["alib_column"] == "__path"][0]
    assert path_entry["old_value"] == "/m/d/a.mp3"
    assert path_entry["new_value"] == renamed["new_path"]


def test_default_renamer_raises(spark):
    rows = [_row("/m/d/a.mp3", track="1", title="T1")]
    plan = rename_plan(_alib(spark, rows))
    with pytest.raises(Exception, match="NotImplementedError|renamer_fn|rename"):
        apply_renames(plan)
