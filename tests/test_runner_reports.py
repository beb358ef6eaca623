"""Runner (tm-cli parity), snapshots, HTML sink, and stateful-streaming
dedup tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tagminder_spark.app import describe_step, list_steps, run_named_step
from tagminder_spark.reports import (
    changelog_fingerprint,
    coverage_snapshot,
    render_dashboard,
)

D = "\\\\"


def test_list_and_describe():
    steps = list_steps()
    nums = [n for n, _, _ in steps]
    assert nums == sorted(nums)
    assert len(steps) >= 20
    assert all(desc for _, _, desc in steps)  # every step self-describes
    assert "clean" in describe_step("02").lower() or describe_step("02")


def test_run_named_step_diff_audit(spark):
    alib = spark.createDataFrame(
        [
            ("p1", "  Title\r\n", "a", 0),
            ("p2", "Clean", "b", 0),
        ],
        "__path string, title string, artist string, __sqlmodded int",
    )
    updated, changelog = run_named_step("02", alib)
    up = {r["__path"]: r for r in updated.collect()}
    assert list(up) == ["p1"]  # only the dirty row
    assert up["p1"]["title"] == "Title"
    assert up["p1"]["__sqlmodded"] == 1
    cl = changelog.collect()
    assert len(cl) == 1 and cl[0]["alib_column"] == "title"


def test_run_named_step_requires_deps(spark):
    alib = spark.createDataFrame(
        [("p1", "x", 0)], "__path string, artist string, __sqlmodded int"
    )
    with pytest.raises(ValueError, match="mapping"):
        run_named_step("07", alib)
    updated, changelog = run_named_step(
        "07", alib, mapping={"x": "X canonical"}
    )
    assert updated.collect()[0]["artist"] == "X canonical"


def test_snapshot_fingerprint_skips_recompute(spark, tmp_path):
    from tagminder_spark.reports import snapshot_if_changed

    alib = spark.createDataFrame(
        [("p1", "/a", "T", 0), ("p2", "/a", None, 0)],
        "__path string, __dirpath string, title string, __sqlmodded int",
    )
    cl_rows = [("p1", "title", None, "T", "02", "2024-01-01T00:00:00")]
    cl_schema = (
        "alib_path string, alib_column string, old_value string,"
        " new_value string, script string, timestamp string"
    )
    changelog = spark.createDataFrame(cl_rows, cl_schema)
    runs = str(tmp_path / "snap_runs")

    first = snapshot_if_changed(alib, changelog, ["title"], "r1", runs)
    assert first is not None and first.collect()[0]["total_rows"] == 2
    # unchanged changelog → skip
    assert snapshot_if_changed(alib, changelog, ["title"], "r2", runs) is None
    # a new changelog entry moves the fingerprint → recompute
    changelog2 = spark.createDataFrame(
        cl_rows + [("p2", "title", None, "X", "02", "2024-01-02T00:00:00")],
        cl_schema,
    )
    assert snapshot_if_changed(alib, changelog2, ["title"], "r3", runs) is not None


def test_run_step22_through_diff_audit(spark):
    alib = spark.createDataFrame(
        [
            # exact workid match → score 70+35=105, margin 105 → auto-apply
            ("p1", "song one", "wm-1", None, "alice", None, 0),
            # no candidate at all → untouched
            ("p2", "unmatched", None, None, "bob", None, 0),
        ],
        "__path string, title string, musicbrainz_workid string, work string,"
        " composer string, lyricist string, __sqlmodded int",
    )
    works = spark.createDataFrame(
        [(1, "wm-1", "song one", "Song One", "alice", None)],
        "work_id bigint, work_mbid string, work_title_norm string,"
        " work_title string, people_composer string, alias_norm string",
    )
    updated, changelog = run_named_step("22", alib, works=works)
    up = {r["__path"]: r for r in updated.collect()}
    assert list(up) == ["p1"]
    assert up["p1"]["work"] == "Song One"
    cl = {(r.alib_path, r.alib_column): (r.old_value, r.new_value) for r in changelog.collect()}
    assert cl[("p1", "work")] == (None, "Song One")
    assert all(path == "p1" for path, _ in cl)


def test_run_step15_workspace_diff_audit(spark):
    alib = spark.createDataFrame(
        [("p1", "Beatles", None, None, 0), ("p2", "Beatless", None, None, 0)],
        "__path string, artist string, albumartist string, composer string,"
        " __sqlmodded int",
    )
    ws1, cl1 = run_named_step("15", alib)
    pairs = {(r.name_a, r.name_b) for r in ws1.collect()}
    assert ("Beatles", "Beatless") in pairs
    # first run: every pair is an add, logged NULL→similarity
    adds = cl1.collect()
    assert adds and all(r.old_value is None for r in adds)
    # second run against the previous snapshot: no delta
    ws2, cl2 = run_named_step("15", alib, previous=ws1)
    assert cl2.count() == 0


def test_coverage_snapshot(spark):
    alib = spark.createDataFrame(
        [
            ("/m/a/1", "/m/a", "T", None),
            ("/m/a/2", "/m/a", None, None),
            ("/m/b/1", "/m/b", "T", "Y"),
        ],
        "__path string, __dirpath string, title string, year string",
    )
    snap = coverage_snapshot(alib, ["title", "year"], "run1").collect()[0]
    assert snap["total_rows"] == 3
    assert snap["nonblank_title"] == 2
    assert snap["nonblank_year"] == 1
    # album metric: mean of per-album ratios — (0.5 + 1.0)/2
    assert abs(snap["album_ratio_title"] - 0.75) < 1e-9
    assert snap["run_id"] == "run1" and snap["phase"] == "before"


def test_changelog_fingerprint(spark):
    cl = spark.createDataFrame(
        [("p1", "title", "a", "b", "2026-01-01T00:00:00Z", "02")],
        "alib_path string, alib_column string, old_value string,"
        " new_value string, timestamp string, script string",
    )
    ts, n = changelog_fingerprint(cl)
    assert n == 1 and ts == "2026-01-01T00:00:00Z"


def test_render_dashboard(spark, tmp_path):
    agg = spark.createDataFrame([("FLAC", 10), ("MP3", 5)], "filetype string, n int")
    out = render_dashboard({"format mix": agg}, tmp_path / "dash.html")
    text = out.read_text()
    assert "<table>" in text and "FLAC" in text and "format mix" in text


def test_render_insights_dashboard_all_cards(spark, tmp_path):
    """The assembled insights page runs EVERY ported card family (incl.
    the round-8 tranche: timeline, RG extremes/dynamics, role
    spotlights, most-instances) and renders each as a section."""
    from tagminder_spark.reports.html import (
        INSIGHTS_SECTIONS,
        render_insights_dashboard,
    )
    from tests.conftest import SF_DIR

    out = render_insights_dashboard(spark, SF_DIR, tmp_path / "insights.html")
    text = out.read_text()
    for name in INSIGHTS_SECTIONS:
        assert f"<caption>{name}</caption>" in text, name
    for new in ("r92_albums_timeline", "r92_rg_extremes", "r92_rg_dynamics",
                "r92_spotlight_roles", "r92_most_instances"):
        assert new in INSIGHTS_SECTIONS
    # the new cards carry real rows, not empty tables
    assert "loudest" in text and "most_dynamic" in text
    assert "classical_aa" in text and "classical_conductor" in text


def test_neighbor_tree_explorer(spark):
    from tagminder_spark.reports.tui import render_neighbor_tree

    edges = spark.createDataFrame(
        [
            ("A", "B", 5), ("B", "A", 5),
            ("A", "C", 3), ("C", "A", 3),
            ("B", "D", 2), ("D", "B", 2),
            ("C", "B", 1), ("B", "C", 1),
        ],
        "src string, dst string, weight int",
    )
    text = render_neighbor_tree(edges, "A", top_k=2, depth=2)
    lines = text.splitlines()
    assert lines[0] == "A"
    # level-1: B (w=5) then C (w=3); level-2 under B: D (A and C pruned as seen)
    assert "  B  (w=5)" in lines and "  C  (w=3)" in lines
    assert "    D  (w=2)" in lines
    assert text.count("A") == 1  # root never re-rendered


def test_render_artist_map_reference_contract(spark, tmp_path):
    """Golden for the reference data contract (tm_graph.py:435-451 +
    tm_artist_map.py:30-62,429-433): case-insensitive node order,
    per-neighbor (-weight, name-lower) order with min_weight filter and
    top-k trim, and the sqrt node-radius formula on post-trim degree."""
    from tagminder_spark.reports.html import render_artist_map

    # directed input; 'ab' vs 'Ba' exercises case-insensitive sorting;
    # A has 3 qualifying neighbors so top_k=2 trims the weakest ('zz');
    # weight-1 edge to 'w0' falls below min_weight=2
    edges = spark.createDataFrame(
        [
            ("A", "ab", 3),
            ("A", "Ba", 3),
            ("A", "zz", 2),
            ("A", "w0", 1),
            ("ab", "Ba", 5),
        ],
        "src string, dst string, weight int",
    )
    out = render_artist_map(
        edges, tmp_path / "map.html", top_k_per_node=2, min_weight=2
    )
    text = out.read_text()
    assert "canvas" in text
    import json, math, re  # noqa: PLC0415

    payload = json.loads(re.search(r"const G = (\{.*?\});", text).group(1))
    # node order: case-insensitive sort; w0 gone (below min_weight)
    assert payload["names"] == ["A", "ab", "Ba", "zz"]
    a, ab, ba, zz = range(4)
    # A's neighbors: (-w, lower) order => ab(3), Ba(3); zz(2) trimmed
    assert payload["adj"][a] == [[ab, 3], [ba, 3]]
    # ab: Ba(5) then A(3)
    assert payload["adj"][ab] == [[ba, 5], [a, 3]]
    # zz keeps its symmetrized edge back to A
    assert payload["adj"][zz] == [[a, 2]]
    # radius = max(3.0, min(9.5, 2.7 + sqrt(post-trim degree)))
    for i, nb in enumerate(payload["adj"]):
        want = round(max(3.0, min(9.5, 2.7 + math.sqrt(len(nb)))), 3)
        assert payload["r"][i] == want
    assert payload["top_k_per_node"] == 2 and payload["min_weight"] == 2


def test_streaming_first_seen_dedup(spark, tmp_path):
    from tagminder_spark.streaming.stateful import (
        DEDUP_OUTPUT_SCHEMA,
        streaming_first_seen_dedup,
    )
    from tagminder_spark.streaming.ingest import run_stream_to_memory

    src = tmp_path / "stream"
    src.mkdir()
    spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k2", 3)], "doc_key string, v int"
    ).coalesce(1).write.parquet(str(src / "batch"))
    stream = (
        spark.readStream.format("parquet")
        .schema("doc_key string, v int")
        .load(str(src / "batch"))
    )
    out = streaming_first_seen_dedup(stream, "doc_key")
    assert out.schema == DEDUP_OUTPUT_SCHEMA
    got = {
        r["key"]: (r["n_new"], r["n_dropped"])
        for r in run_stream_to_memory(out, "dedup_test").collect()
    }
    assert got == {"k1": (1, 1), "k2": (1, 0)}


def test_stateful_dedup_timeout_semantics():
    """The ProcessingTimeTimeout path must expire state silently and re-arm
    the timer on every live update (unit-level; duck-typed GroupState)."""
    import pandas as pd

    from tagminder_spark.streaming.stateful import _make_dedup_fn

    class FakeState:
        def __init__(self, exists=False, seen=0, timed_out=False):
            self.exists, self._seen, self.hasTimedOut = exists, seen, timed_out
            self.removed, self.timeout_set = False, None

        @property
        def get(self):
            return (self._seen,)

        def update(self, v):
            self._seen = v[0]
            self.exists = True

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    fn = _make_dedup_fn(60_000)
    # timed-out invocation: state removed, nothing emitted
    st = FakeState(exists=True, seen=5, timed_out=True)
    assert list(fn(("k",), iter([]), st)) == []
    assert st.removed and st.timeout_set is None
    # live update: timer re-armed, output emitted
    st2 = FakeState()
    out = list(fn(("k",), iter([pd.DataFrame({"x": [1, 2]})]), st2))
    assert len(out) == 1 and st2.timeout_set == 60_000
    assert (out[0].n_new[0], out[0].n_dropped[0]) == (1, 1)
    # NoTimeout variant never touches the timer
    fn0 = _make_dedup_fn(None)
    st3 = FakeState()
    list(fn0(("k",), iter([pd.DataFrame({"x": [1]})]), st3))
    assert st3.timeout_set is None


def test_cli_list_describe_resolve(capsys):
    """tm-spark CLI contract (tm_cli.py:130-241): list names, verbose
    purposes, describe docstrings, spelling normalization, unknown-name
    exit."""
    import pytest as _pytest

    from tagminder_spark.app.cli import cmd_describe, cmd_list, main

    assert cmd_list(verbose=False) == 0
    out = capsys.readouterr().out.splitlines()
    assert "step12-compilations" in out
    assert "q1_pricing_summary" in out
    assert "s98_rename_plan" in out

    assert cmd_list(verbose=True) == 0
    vout = capsys.readouterr().out.splitlines()
    assert any(l.startswith("step12-compilations\t") for l in vout)

    assert cmd_describe("12") == 0  # step-number spelling
    d = capsys.readouterr().out
    assert d.startswith("step12-compilations")
    assert "Docstring" in d

    assert cmd_describe("q1_pricing_summary.py") == 0  # .py tolerated
    capsys.readouterr()

    with _pytest.raises(SystemExit, match="Unknown name"):
        main(["describe", "no_such_thing"])


def test_cli_run_query(spark, capsys):
    from tests.conftest import SF_DIR

    from tagminder_spark.app.cli import cmd_run

    assert cmd_run("h_readiness", SF_DIR) == 0
    assert "h_readiness: 9 rows" in capsys.readouterr().out


def test_tui_search_nodes(spark):
    from tagminder_spark.reports.tui import render_search_results, search_nodes

    edges = spark.createDataFrame(
        [("Alpha", "Beta", 3), ("Alpha", "Gamma", 2), ("Beta", "Alpha", 3),
         ("Gamma", "Alpha", 2), ("Beta", "Gamma", 1), ("Gamma", "Beta", 1)],
        "src string, dst string, weight int",
    )
    # blank query: degree-sorted starter list
    starter = search_nodes(edges, None)
    assert starter[0] == ("Alpha", 2) or starter[0][1] == 2
    assert len(starter) == 3
    # substring search, case-insensitive
    hits = search_nodes(edges, "AMM")
    assert hits == [("Gamma", 2)]
    text = render_search_results(edges, "a")
    assert "Alpha  (2 links)" in text


def test_render_compare_dashboard(spark, tmp_path):
    from tagminder_spark.reports.html import render_compare_dashboard

    deltas = spark.createDataFrame(
        [("title", 0.75, 0.80, 0.05, 0.7, 0.78, 0.08),
         ("artist", 0.66, 0.66, 0.0, 0.6, 0.6, 0.0)],
        "column string, track_before double, track_after double, "
        "track_delta double, album_before double, album_after double, "
        "album_delta double",
    )
    cl = spark.createDataFrame(
        [("title", 120)], "alib_column string, n_changes long"
    )
    out = render_compare_dashboard(deltas, tmp_path / "compare.html",
                                   changelog_summary=cl)
    text = out.read_text()
    assert "before vs after" in text
    assert "+5.0%" in text and "75.0%" in text
    assert "What changed" in text and "120" in text


def test_render_artist_map_bounded_and_pair_deduped(spark, tmp_path):
    """Round-6 ADVICE regression: (1) asymmetric duplicate weights of the
    same (src, dst) pair collapse to the MAX and occupy one top-k slot;
    (2) max_nodes bounds the node list (and the driver collect) by the
    case-insensitive name order, not by whatever survives the trim."""
    import json
    import re

    from tagminder_spark.reports.html import render_artist_map

    edges = spark.createDataFrame(
        [
            # duplicate pair with asymmetric weights: one slot, weight 7
            ("A", "b1", 7),
            ("b1", "A", 4),
            ("A", "b2", 6),
            ("A", "b3", 5),
            ("c9", "zz", 2),
        ],
        "src string, dst string, weight int",
    )
    out = render_artist_map(
        edges, tmp_path / "m.html", top_k_per_node=2, min_weight=1, max_nodes=4
    )
    payload = json.loads(
        re.search(r"const G = (\{.*?\});", out.read_text()).group(1)
    )
    # node universe is A,b1,b2,b3,c9,zz; max_nodes=4 keeps the first 4
    # in case-insensitive order
    assert payload["names"] == ["A", "b1", "b2", "b3"]
    a = payload["names"].index("A")
    # A's top-2: b1 with the MAXed weight 7 (one slot, not two), then b2
    assert payload["adj"][a] == [[1, 7], [2, 6]]


def test_render_artist_map_interactive_payload(spark, tmp_path):
    """Round 6: the embedded payload carries the reference's layout
    constants (tm_artist_map.py:195-201) and the page carries the
    reference's interaction surface (search / random focus / reset,
    pan, zoom, tooltip, double-click focus) with no network dependency."""
    import json
    import re

    from tagminder_spark.reports.html import render_artist_map

    edges = spark.createDataFrame(
        [("A", "b", 3), ("b", "C", 2)], "src string, dst string, weight int"
    )
    text = render_artist_map(edges, tmp_path / "m.html").read_text()
    payload = json.loads(re.search(r"const G = (\{.*?\});", text).group(1))
    assert payload["layout"] == {
        "linkBase": 64, "linkVar": 320, "charge": -160, "collisionPad": 26
    }
    for anchor in (
        'id="q"', 'id="random"', 'id="reset"', 'id="tip"',
        "onwheel", "ondblclick", "onmousedown",
    ):
        assert anchor in text
    assert "http" not in text.lower().replace("http-equiv", "")  # offline page


def test_cli_tui_subcommand_parsing_and_validation(monkeypatch):
    """`tm-spark tui` wiring: parser accepts both screens, colsel
    demands --config, the screen construction reaches the runtime loop
    (stubbed) with a ready ColumnMatrixScreen."""
    import pytest as _pytest

    from tagminder_spark.app import cli, tui_runtime

    args = cli.build_parser().parse_args(["tui", "explorer"])
    assert args.command == "tui" and args.screen == "explorer"

    with _pytest.raises(SystemExit, match="--config"):
        cli.cmd_tui("colsel", "/tmp", None)

    captured = {}
    monkeypatch.setattr(
        "tagminder_spark.app.tui_runtime.run",
        lambda screen, keys=None: captured.setdefault("screen", screen),
    )
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as d:
        cfg = Path(d) / "tagminder.toml"
        cfg.write_text(
            '[columns]\nschema_columns = ["title"]\n'
            '[cleanup]\nkeep_columns = ["title"]\ndedupe_columns = []\n'
            "[reports.missing_critical_tags_by_album]\ncritical_columns = []\n"
            "[reports.multi_value_tags_by_album]\ntags = []\n",
            encoding="utf-8",
        )
        assert cli.cmd_tui("colsel", "/tmp", str(cfg)) == 0
    assert isinstance(captured["screen"], tui_runtime.ColumnMatrixScreen)
