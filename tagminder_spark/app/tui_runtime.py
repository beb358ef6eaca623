"""Interactive widget runtime for the two ported TUI screens — the last
reference surface without an engine-side counterpart (VERDICT r6 #7).

The reference builds its screens on Textual (`src/tagminder/app/
tm_tui.py`: ColumnSelectionMatrixScreen :600-827, ArtistGraphExplorer
:104-360).  This runtime keeps the same separation the ports already
established — ALL state lives in the UI-free models (`app/colsel.
ColumnMatrix`, `reports/tui.ExplorerSession`) — and adds the missing
interactive layer as plain text-frame screens driven by a key loop:

- each screen renders a deterministic text FRAME (list of lines) and
  consumes one key at a time — exactly the shape a golden-transcript
  test can pin;
- ``run(screen, keys=...)`` drives a scripted key sequence headlessly
  and returns every frame (tests, recordings);
- ``run(screen)`` with no script runs a real terminal loop on stdin
  (raw mode via termios, ANSI clear+home between frames) — driver-side
  only, no Spark in the runtime itself;
- ``run_textual(screen)`` adapts the same screen object onto Textual
  when that library is installed (import-try; this container ships
  without it, so the adapter raises a clear RuntimeError instead).

Key bindings mirror the reference's BINDINGS tables (tm_tui.py:152-163
explorer: escape/b; :629-635 matrix: escape/q close, s save,
enter/space toggle) plus arrow/vi navigation for the cursor the
DataTable widget used to provide.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

# canonical key names produced by the terminal reader and accepted by
# screens: printable chars as themselves, plus these specials
KEY_UP, KEY_DOWN, KEY_LEFT, KEY_RIGHT = "UP", "DOWN", "LEFT", "RIGHT"
KEY_ENTER, KEY_ESC, KEY_BACKSPACE, KEY_SPACE = "ENTER", "ESC", "BACKSPACE", " "


class Screen:
    """Contract: ``render() -> list[str]``; ``on_key(key) -> bool``
    (False ⇒ close the screen); ``title``."""

    title = "screen"

    def render(self) -> list[str]:  # pragma: no cover - interface
        raise NotImplementedError

    def on_key(self, key: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError


def _clip(s: str, width: int) -> str:
    return s[:width].ljust(width)


class ColumnMatrixScreen(Screen):
    """Interactive face of :class:`~tagminder_spark.app.colsel.
    ColumnMatrix` — the reference's ColumnSelectionMatrixScreen
    (tm_tui.py:600-827) without the widget library.

    Modes: ``nav`` (cursor over the matrix) and ``filter`` (typing into
    the filter input, like the reference's always-focused Input).
    """

    title = "Configure column selections (tagminder.toml)"

    def __init__(self, matrix, config_path=None, *, height: int = 18,
                 width: int = 72, stamp: str = "19700101-000000") -> None:
        from tagminder_spark.app.colsel import LIST_SPECS

        self.matrix = matrix
        self.config_path = config_path
        self.specs = list(LIST_SPECS)
        self.height = height
        self.width = width
        self.stamp = stamp
        self.mode = "nav"
        self.filter_text = ""
        self.row = 0           # index into filtered columns
        self.col = 0           # index into specs
        self.scroll = 0
        self.status = "Ready."

    # -- state helpers ------------------------------------------------
    def rows(self) -> list[str]:
        return self.matrix.filtered(self.filter_text)

    def _clamp(self) -> None:
        n = len(self.rows())
        self.row = max(0, min(self.row, n - 1)) if n else 0
        self.col = max(0, min(self.col, len(self.specs) - 1))
        body = self.height - 6
        if self.row < self.scroll:
            self.scroll = self.row
        elif self.row >= self.scroll + body:
            self.scroll = self.row - body + 1

    # -- key handling (BINDINGS tm_tui.py:629-635) ---------------------
    def on_key(self, key: str) -> bool:
        if self.mode == "filter":
            if key == KEY_ENTER:
                self.mode = "nav"
            elif key == KEY_ESC:
                self.filter_text = ""
                self.mode = "nav"
            elif key == KEY_BACKSPACE:
                self.filter_text = self.filter_text[:-1]
            elif len(key) == 1 and key.isprintable():
                self.filter_text += key
            self.row = self.scroll = 0
            self._clamp()
            return True
        if key in (KEY_ESC, "q"):
            return False
        if key == "/":
            self.mode = "filter"
        elif key in (KEY_UP, "k"):
            self.row -= 1
        elif key in (KEY_DOWN, "j"):
            self.row += 1
        elif key in (KEY_LEFT, "h"):
            self.col -= 1
        elif key in (KEY_RIGHT, "l"):
            self.col += 1
        elif key in (KEY_ENTER, KEY_SPACE):
            rows = self.rows()
            if rows:
                table, k, _ = self.specs[self.col]
                path = f"{table}.{k}"
                on = self.matrix.toggle(path, rows[self.row])
                self.status = (
                    f"{'added' if on else 'removed'} "
                    f"{rows[self.row]} {'to' if on else 'from'} {path}"
                )
        elif key == "s":
            if self.config_path is None:
                self.status = "No config path — nothing saved."
            else:
                bak = self.matrix.save(self.config_path, self.stamp)
                self.status = f"Saved. Backup: {bak.name}"
        self._clamp()
        return True

    # -- rendering ------------------------------------------------------
    def render(self) -> list[str]:
        self._clamp()
        labels = [label for _, _, label in self.specs]
        name_w = self.width - 4 - 11 * len(labels)
        head = " " * 4 + _clip("column", name_w) + "".join(
            _clip(("[" + lb + "]") if i == self.col else f" {lb} ", 11)
            for i, lb in enumerate(labels)
        )
        lines = [
            _clip(self.title, self.width),
            _clip(
                f"Filter: {self.filter_text}"
                + ("▌" if self.mode == "filter" else ""),
                self.width,
            ),
            _clip(head, self.width),
            "-" * self.width,
        ]
        rows = self.rows()
        body = self.height - 6
        for i in range(self.scroll, min(len(rows), self.scroll + body)):
            c = rows[i]
            cur = ">" if (i == self.row and self.mode == "nav") else " "
            cells = "".join(
                _clip(
                    "    ✓" if self.matrix.cell(f"{t}.{k}", c) else "    ·",
                    11,
                )
                for t, k, _ in self.specs
            )
            lines.append(_clip(f" {cur}  " + _clip(c, name_w) + cells,
                               self.width))
        while len(lines) < self.height - 2:
            lines.append(" " * self.width)
        lines.append("-" * self.width)
        lines.append(_clip(
            f"{self.status}  [{len(rows)} cols] "
            "(/ filter · arrows/hjkl · space toggle · s save · q quit)",
            self.width,
        ))
        return lines


class ExplorerScreen(Screen):
    """Interactive face of :class:`~tagminder_spark.reports.tui.
    ExplorerSession` — the reference's ArtistGraphExplorerScreen
    (tm_tui.py:104-360): search input, Matches and Neighbors panes,
    status line; Enter visits the selected match, ``b`` goes back.

    The session object is duck-typed (``visit/back/results/neighbors/
    status``) so transcripts run against a fake with no Spark.
    """

    title = "Artist Graph Explorer"

    def __init__(self, session, *, height: int = 16, width: int = 72,
                 result_rows: int = 200) -> None:
        self.session = session
        self.height = height
        self.width = width
        self.result_rows = result_rows
        self.query = ""
        self.sel = 0
        self.note = ""

    def _matches(self) -> list[tuple[str, int]]:
        return list(self.session.results(self.query, self.result_rows))

    def on_key(self, key: str) -> bool:
        if key == KEY_ESC:
            return False
        if key == KEY_ENTER:
            matches = self._matches()
            if matches:
                self.sel = min(self.sel, len(matches) - 1)
                self.session.visit(matches[self.sel][0])
                self.note = ""
        elif key == KEY_UP:
            self.sel = max(0, self.sel - 1)
        elif key == KEY_DOWN:
            self.sel += 1
        elif key == KEY_BACKSPACE:
            self.query = self.query[:-1]
            self.sel = 0
        elif key == "b":
            # the reference rings the bell on empty history (:178-186)
            self.note = "" if self.session.back() else "(bell)"
        elif len(key) == 1 and key.isprintable():
            self.query += key
            self.sel = 0
        return True

    def render(self) -> list[str]:
        matches = self._matches()
        self.sel = max(0, min(self.sel, len(matches) - 1)) if matches else 0
        neighbors = list(self.session.neighbors())
        half = (self.width - 3) // 2
        lines = [
            _clip(self.title, self.width),
            _clip(f"Search: {self.query}▌", self.width),
            _clip(f"{self.session.status()} {self.note}".rstrip(),
                  self.width),
            _clip(_clip("Matches", half) + " | " + _clip("Neighbors", half),
                  self.width),
            "-" * self.width,
        ]
        body = self.height - 6
        for i in range(body):
            left = ""
            if i < len(matches):
                name, deg = matches[i]
                cur = ">" if i == self.sel else " "
                left = f"{cur} {name}  ({deg} links)"
            right = ""
            if i < len(neighbors):
                nname, w = neighbors[i]
                right = f"{nname}  [{w}]"
            lines.append(
                _clip(_clip(left, half) + " | " + _clip(right, half),
                      self.width)
            )
        lines.append(_clip("(type to search · Enter visit · b back · "
                           "Esc close)", self.width))
        return lines


# ---------------------------------------------------------------------------
# loops
# ---------------------------------------------------------------------------

def run(screen: Screen, keys: Iterable[str] | None = None,
        out=None) -> list[list[str]]:
    """Drive a screen.  With ``keys`` (scripted): feed each key, collect
    the frame after every event, return all frames — the transcript the
    goldens pin.  Without: real terminal loop on stdin until the screen
    closes (driver-side interactive use)."""
    frames = [screen.render()]
    if keys is not None:
        for key in keys:
            if not screen.on_key(key):
                break
            frames.append(screen.render())
        return frames
    # interactive: paint the initial frame BEFORE blocking on the first
    # key — otherwise the user stares at a blank terminal
    print("\x1b[2J\x1b[H" + "\n".join(frames[0]),  # pragma: no cover
          file=out, flush=True)
    for key in _stdin_keys():  # pragma: no cover - interactive only
        if not screen.on_key(key):
            break
        frame = screen.render()
        frames = [frame]
        print("\x1b[2J\x1b[H" + "\n".join(frame),
              file=out, flush=True)
    return frames


def _stdin_keys() -> Iterator[str]:  # pragma: no cover - interactive only
    """Raw-mode single-key reader with arrow/escape decoding."""
    import sys
    import termios
    import tty

    import os
    import select

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        while True:
            ch = sys.stdin.read(1)
            if not ch:
                return
            if ch == "\x1b":
                # a bare ESC press must not block waiting for two more
                # bytes: escape SEQUENCES arrive together, so a short
                # select distinguishes them from a lone ESC
                rest = ""
                while len(rest) < 2 and select.select([fd], [], [], 0.05)[0]:
                    more = os.read(fd, 2 - len(rest)).decode(
                        "utf-8", "replace"
                    )
                    if not more:
                        break
                    rest += more
                yield {"[A": KEY_UP, "[B": KEY_DOWN, "[C": KEY_RIGHT,
                       "[D": KEY_LEFT}.get(rest, KEY_ESC)
            elif ch in ("\r", "\n"):
                yield KEY_ENTER
            elif ch in ("\x7f", "\x08"):
                yield KEY_BACKSPACE
            elif ch == "\x03":
                return
            else:
                yield ch
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


def run_textual(screen: Screen):  # pragma: no cover - textual not shipped
    """Adapt a runtime screen onto Textual when available.  The engine
    container ships without textual, so this raises with instructions
    rather than silently degrading; the plain-terminal ``run`` covers
    every interaction the goldens test."""
    try:
        from textual.app import App
        from textual.widgets import Static
    except ImportError as exc:
        raise RuntimeError(
            "textual is not installed; use tui_runtime.run(screen) for "
            "the built-in terminal loop, or pip install textual"
        ) from exc

    class _Adapter(App):
        def compose(self):
            self._view = Static("\n".join(screen.render()))
            yield self._view

        def on_key(self, event) -> None:
            name = {"escape": KEY_ESC, "enter": KEY_ENTER,
                    "backspace": KEY_BACKSPACE, "up": KEY_UP,
                    "down": KEY_DOWN, "left": KEY_LEFT,
                    "right": KEY_RIGHT, "space": KEY_SPACE}.get(
                        event.key, event.character or "")
            if name and not screen.on_key(name):
                self.exit()
                return
            self._view.update("\n".join(screen.render()))

    return _Adapter().run()
