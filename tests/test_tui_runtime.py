"""Golden screen-model transcripts for the interactive TUI runtime
(VERDICT r6 #7): scripted key sequences drive the real screens, every
rendered frame is deterministic, and the end state round-trips through
the models' save paths.  No Spark involvement — the explorer runs
against a duck-typed fake session."""

from __future__ import annotations

from pathlib import Path

import pytest

from tagminder_spark.app.colsel import ColumnMatrix
from tagminder_spark.app.tui_runtime import (
    KEY_BACKSPACE,
    KEY_DOWN,
    KEY_ENTER,
    KEY_ESC,
    KEY_RIGHT,
    KEY_SPACE,
    KEY_UP,
    ColumnMatrixScreen,
    ExplorerScreen,
    run,
    run_textual,
)

GOLDEN_DIR = Path(__file__).parent / "goldens"

CONFIG = """\
[columns]
schema_columns = ["title", "artist", "album", "composer", "genre"]

[cleanup]
keep_columns = ["title", "artist"]
dedupe_columns = ["title"]

[reports.missing_critical_tags_by_album]
critical_columns = ["album"]

[reports.multi_value_tags_by_album]
tags = ["genre"]
"""


def _transcript(frames: list[list[str]]) -> str:
    out = []
    for i, frame in enumerate(frames):
        out.append(f"=== frame {i} ===")
        out.extend(line.rstrip() for line in frame)
    return "\n".join(out) + "\n"


def _check_golden(name: str, text: str) -> None:
    path = GOLDEN_DIR / name
    if not path.exists():  # first run records the golden
        path.write_text(text, encoding="utf-8")
    assert text == path.read_text(encoding="utf-8"), (
        f"transcript drifted from {name}; delete the golden to re-record"
    )


class TestColumnMatrixScreen:
    def test_golden_navigation_toggle_filter(self, tmp_path):
        cfg = tmp_path / "tagminder.toml"
        cfg.write_text(CONFIG, encoding="utf-8")
        screen = ColumnMatrixScreen(
            ColumnMatrix(CONFIG), cfg, height=12, width=68
        )
        keys = [
            KEY_DOWN, KEY_DOWN,            # cursor → album
            KEY_RIGHT,                     # column → dedupe
            KEY_SPACE,                     # add album to dedupe
            "/", "g", "e", "n", KEY_ENTER,  # filter to genre
            KEY_SPACE,                     # toggle genre in dedupe
            KEY_ESC,                       # ESC in nav closes
        ]
        frames = run(screen, keys)
        _check_golden("tui_matrix_transcript.txt", _transcript(frames))

    def test_toggle_then_save_roundtrip(self, tmp_path):
        cfg = tmp_path / "tagminder.toml"
        cfg.write_text(CONFIG, encoding="utf-8")
        m = ColumnMatrix(CONFIG)
        screen = ColumnMatrixScreen(m, cfg, height=12, width=68)
        # add "album" to keep_columns, remove "title" from dedupe, save
        run(screen, [KEY_DOWN, KEY_DOWN, KEY_SPACE,
                     KEY_UP, KEY_UP, KEY_RIGHT, KEY_SPACE, "s"])
        text = cfg.read_text(encoding="utf-8")
        assert 'keep_columns = [\n    "title",\n    "artist",\n    "album",\n]' in text.replace('", "', '",\n    "') or "album" in text
        m2 = ColumnMatrix(text)
        assert "album" in m2.members["cleanup.keep_columns"]
        assert "title" not in m2.members["cleanup.dedupe_columns"]
        # backup written beside the original
        assert list(tmp_path.glob("tagminder.toml.bak-*"))

    def test_filter_backspace_and_clear(self):
        screen = ColumnMatrixScreen(ColumnMatrix(CONFIG), None,
                                    height=12, width=68)
        run(screen, ["/", "z", "z"])
        assert screen.rows() == []
        run(screen, [KEY_BACKSPACE, KEY_BACKSPACE])
        assert screen.rows() == screen.matrix.all_columns
        run(screen, ["x", KEY_ESC])          # ESC clears filter
        assert screen.filter_text == ""
        assert screen.mode == "nav"

    def test_q_closes(self):
        screen = ColumnMatrixScreen(ColumnMatrix(CONFIG), None)
        frames = run(screen, ["q", KEY_DOWN, KEY_DOWN])
        assert len(frames) == 1  # closed on first key, no further frames


class _FakeSession:
    """Duck-typed stand-in for ExplorerSession: same visit/back/
    results/neighbors/status surface, scripted data, no Spark."""

    def __init__(self) -> None:
        self.nodes = [("Miles Davis", 42), ("Milton Nascimento", 17),
                      ("Emiliana Torrini", 9), ("Herbie Hancock", 31)]
        self.graph = {
            "Miles Davis": [("Herbie Hancock", 12), ("John Coltrane", 9)],
            "Herbie Hancock": [("Miles Davis", 12)],
        }
        self.current = None
        self.history = []

    def visit(self, name):
        if self.current and self.current != name:
            self.history.append(self.current)
        self.current = name

    def back(self):
        if not self.history:
            return False
        self.current = self.history.pop()
        return True

    def results(self, query, limit=200):
        q = (query or "").strip().lower()
        hits = [x for x in self.nodes if q in x[0].lower()]
        return sorted(hits, key=lambda x: (-x[1], x[0]))[:limit]

    def neighbors(self):
        return self.graph.get(self.current, [])

    def status(self):
        if not self.current:
            return "Ready. Type to search, then Enter."
        return (f"Focus: {self.current} | "
                f"neighbors: {len(self.neighbors()):,d} | "
                f"history: {len(self.history):,d}")


class TestExplorerScreen:
    def test_golden_search_visit_back(self):
        screen = ExplorerScreen(_FakeSession(), height=12, width=68)
        keys = ["m", "i", "l",            # search "mil"
                KEY_ENTER,                 # visit Miles Davis
                KEY_BACKSPACE, KEY_BACKSPACE, KEY_BACKSPACE,
                "h", "e", "r", KEY_ENTER,  # visit Herbie Hancock
                "b",                       # back to Miles
                "b",                       # empty history → (bell)
                KEY_ESC]
        frames = run(screen, keys)
        _check_golden("tui_explorer_transcript.txt", _transcript(frames))
        # semantic checks on the final visible frame
        last = "\n".join(frames[-1])
        assert "Focus: Miles Davis" in last
        assert "(bell)" in last

    def test_selection_moves(self):
        s = _FakeSession()
        screen = ExplorerScreen(s, height=12, width=68)
        run(screen, ["mi", KEY_DOWN, KEY_ENTER]
            if False else ["m", "i", KEY_DOWN, KEY_ENTER])
        assert s.current == "Milton Nascimento"  # second match visited

    def test_with_real_session_over_local_edges(self, spark):
        """The real ExplorerSession (Spark-backed) drives the same
        screen — one smoke frame, bounded collect."""
        from tagminder_spark.reports.tui import ExplorerSession

        edges = spark.createDataFrame(
            [("A", "B", 3), ("A", "C", 2), ("B", "A", 3), ("C", "A", 2)],
            "src string, dst string, weight int",
        )
        screen = ExplorerScreen(ExplorerSession(edges), height=10, width=60)
        frames = run(screen, ["a", KEY_ENTER])
        last = "\n".join(frames[-1])
        assert "Focus: A" in last
        assert "B  [3]" in last


def test_run_textual_raises_cleanly_without_textual():
    screen = ColumnMatrixScreen(ColumnMatrix(CONFIG), None)
    try:
        import textual  # noqa: F401
        pytest.skip("textual installed in this environment")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="textual is not installed"):
        run_textual(screen)
