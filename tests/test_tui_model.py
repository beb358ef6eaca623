"""Tests for the round-4 TUI depth port: explorer navigation state
machine, column-selection matrix model, and catalog classification
(reference src/tagminder/app/tm_tui.py screens, minus the widget layer)."""

from __future__ import annotations

from pathlib import Path

from tagminder_spark.app.catalog import (
    CATEGORY_HEALTH,
    CATEGORY_IO,
    CATEGORY_MDM,
    RunStatus,
    catalog,
    category_for_query,
    format_label,
    matches_filter,
    parse_step_number,
)
from tagminder_spark.app.colsel import (
    ColumnMatrix,
    backup_name,
    find_table_range,
    get_list,
    replace_or_insert_list,
)

TOML = """# user comment stays
[columns]
system_prefix = "__"
schema_columns = ["title", "artist", "album", "year", "__path"]

[cleanup]
keep_columns = [
\t"title",
\t"artist",
]

[reports.missing_critical_tags_by_album]
critical_columns = ["title", "artist", "album"]

[other]
x = 1
"""


# ---------------------------------------------------------------------------
# TOML surgery


def test_find_table_range_and_get_list():
    lines = TOML.splitlines()
    rng = find_table_range(lines, "cleanup")
    assert rng is not None
    start, end = rng
    assert lines[start].strip() == "[cleanup]"
    assert lines[end].strip() == "[reports.missing_critical_tags_by_album]"
    import tomllib

    cfg = tomllib.loads(TOML)
    assert get_list(cfg, "cleanup", "keep_columns") == ["title", "artist"]
    assert get_list(cfg, "reports.missing_critical_tags_by_album", "critical_columns") == [
        "title", "artist", "album",
    ]
    assert get_list(cfg, "nope", "k") == []


def test_replace_preserves_surroundings():
    out = replace_or_insert_list(TOML, "cleanup", "keep_columns", ["genre"])
    assert "# user comment stays" in out
    assert '\t"genre",' in out
    assert '"title",\n\t"artist",\n]' not in out.replace("\t", "\t")
    # other tables untouched
    assert 'critical_columns = ["title", "artist", "album"]' in out
    assert out.endswith("\n")
    import tomllib

    cfg = tomllib.loads(out)
    assert cfg["cleanup"]["keep_columns"] == ["genre"]


def test_insert_into_existing_table_and_new_table():
    out = replace_or_insert_list(TOML, "cleanup", "dedupe_columns", ["artist"])
    import tomllib

    cfg = tomllib.loads(out)
    assert cfg["cleanup"]["dedupe_columns"] == ["artist"]
    assert cfg["cleanup"]["keep_columns"] == ["title", "artist"]

    out2 = replace_or_insert_list(TOML, "reports.multi_value_tags_by_album", "tags", ["genre"])
    cfg2 = tomllib.loads(out2)
    assert cfg2["reports"]["multi_value_tags_by_album"]["tags"] == ["genre"]


def test_backup_name():
    p = backup_name(Path("/x/tagminder.toml"), "20260814-120000")
    assert p.name == "tagminder.toml.bak-20260814-120000"


# ---------------------------------------------------------------------------
# matrix model


def test_matrix_load_toggle_save(tmp_path):
    m = ColumnMatrix(TOML)
    # system-prefixed column excluded from the universe
    assert "__path" not in m.all_columns
    # schema order first, extras sorted after
    assert m.all_columns[:4] == ["title", "artist", "album", "year"]
    assert m.cell("cleanup.keep_columns", "title")
    assert not m.cell("cleanup.keep_columns", "year")

    # toggle off an original member, toggle on two new ones out of order
    m.toggle("cleanup.keep_columns", "artist")
    m.toggle("cleanup.keep_columns", "year")
    m.toggle("cleanup.keep_columns", "album")
    lists = m.final_lists()
    # original order kept for survivors; additions in first-add order
    assert lists["cleanup.keep_columns"] == ["title", "year", "album"]

    cfg_path = tmp_path / "tagminder.toml"
    cfg_path.write_text(TOML, encoding="utf-8")
    bak = m.save(cfg_path, "20260814-000000")
    assert bak.exists() and bak.read_text(encoding="utf-8") == TOML
    import tomllib

    cfg = tomllib.loads(cfg_path.read_text(encoding="utf-8"))
    assert cfg["cleanup"]["keep_columns"] == ["title", "year", "album"]
    # untouched lists resaved identically
    assert cfg["reports"]["missing_critical_tags_by_album"]["critical_columns"] == [
        "title", "artist", "album",
    ]
    assert cfg["other"]["x"] == 1


def test_matrix_filter():
    m = ColumnMatrix(TOML)
    assert m.filtered("ar") == ["artist", "year"]
    assert m.filtered("") == m.all_columns


# ---------------------------------------------------------------------------
# explorer session


def test_explorer_session_navigation(spark):
    from tagminder_spark.reports.tui import ExplorerSession

    edges = spark.createDataFrame(
        [("A", "B", 5), ("A", "C", 3), ("B", "A", 5), ("B", "D", 2),
         ("C", "A", 3), ("D", "B", 2)],
        "src string, dst string, weight int",
    )
    s = ExplorerSession(edges, neighbor_limit=10)
    assert s.status() == "Ready. Type to search, then Enter."
    assert not s.back()

    s.visit("A")
    assert s.neighbors() == [("B", 5), ("C", 3)]
    s.visit("B")
    assert s.history == ["A"]
    s.visit("B")  # re-visiting the focus node does not grow history
    assert s.history == ["A"]
    s.visit("D")
    assert s.history == ["A", "B"]
    assert "Focus: D" in s.status() and "history: 2" in s.status()
    assert s.back() and s.current == "B"
    assert s.back() and s.current == "A"
    assert not s.back()


# ---------------------------------------------------------------------------
# catalog


def test_catalog_classification():
    assert category_for_query("h_works_role_pairs") == CATEGORY_MDM
    assert category_for_query("v89_validate_vetted") == CATEGORY_MDM
    assert category_for_query("r92_album_stats") == CATEGORY_HEALTH
    assert category_for_query("s98_rename_plan") == CATEGORY_IO
    assert parse_step_number("pl_step07_vetted") == 7
    assert parse_step_number("pl_chain_e2e") is None
    assert format_label("x", None) == "x"
    assert format_label("x", RunStatus(0, "12:00")) == "[OK 12:00] x"
    assert format_label("x", RunStatus(3, "12:00")) == "[ERR 3 12:00] x"
    assert matches_filter(["works", "role"], "h_works_role_pairs", "role pairs")
    assert not matches_filter(["nope"], "h_works_role_pairs", None)

    rows = catalog({"pl_step02_changelog": 0, "pl_step01_merges": 0, "r92_album_stats": 0})
    names = [r[1] for r in rows]
    # steps sort by number within their category
    assert names.index("pl_step01_merges") < names.index("pl_step02_changelog")
