"""Column-selection matrix model — the engine behind the reference TUI's
"Configure column selections" screen (src/tagminder/app/tm_tui.py:462-827,
ColumnSelectionMatrixScreen + the _colsel_* helpers) and its standalone
CLI twin (scripts/config/zz-configure-column-selections-in-toml.py:68-290,
which shares the same TOML-surgery helper set).

The Textual widget layer stays driver-side UI and is not ported; this
module ports its semantics as a plain, fully-testable state machine:

- loading the four configured column lists from a TOML config, dropping
  system-prefixed columns, with the full column universe ordered as
  schema columns first then sorted extras (tm_tui.py:674-720);
- toggling membership per (list, column) cell, remembering first-add
  order (tm_tui.py:755-778);
- saving back into the ORIGINAL config text with surgical list-block
  replacement that preserves surrounding formatting, original item
  order, appends newly-added columns in schema order, and writes a
  timestamped backup of the untouched original once per session
  (tm_tui.py:780-827, 503-570).

No tomllib round-trip on save: rewriting the whole file would destroy
comments and formatting the user owns — the reference edits only the
list blocks in place, and so does this port.
"""

from __future__ import annotations

import tomllib
from collections.abc import Callable
from pathlib import Path

#: (toml table, key, short ui label) — tm_tui.py:637-642.
LIST_SPECS: tuple[tuple[str, str, str], ...] = (
    ("cleanup", "keep_columns", "keep"),
    ("cleanup", "dedupe_columns", "dedupe"),
    ("reports.missing_critical_tags_by_album", "critical_columns", "critical"),
    ("reports.multi_value_tags_by_album", "tags", "multi"),
)


# ---------------------------------------------------------------------------
# TOML list-block surgery (pure text functions)


def is_section_header(line: str) -> bool:
    """A `[table]` header line; `[[array-of-tables]]` does not count."""
    s = line.strip()
    return s.startswith("[") and s.endswith("]") and not s.startswith("[[")


def find_table_range(lines: list[str], table: str) -> tuple[int, int] | None:
    """(header index, exclusive end) of a TOML table's body, the end
    being the next section header or EOF."""
    try:
        start = next(
            i for i, ln in enumerate(lines) if ln.strip() == f"[{table}]"
        )
    except StopIteration:
        return None
    end = next(
        (j for j in range(start + 1, len(lines)) if is_section_header(lines[j])),
        len(lines),
    )
    return start, end


def format_list_block(
    key: str, items: list[str], indent: str = "", item_indent: str = "\t"
) -> list[str]:
    """Multi-line TOML list block, one quoted item per line."""
    return [
        f"{indent}{key} = [",
        *[f'{item_indent}"{it}",' for it in items],
        f"{indent}]",
    ]


def _locate_list_block(
    lines: list[str], start: int, end: int, key: str
) -> tuple[int, int, str, str] | None:
    """Find `key = [...]` inside a table body; returns (block start,
    block end inclusive, key indent, inferred item indent)."""
    for i in range(start + 1, end):
        ln = lines[i]
        stripped = ln.lstrip(" \t")
        if "=" not in stripped:
            continue
        k, _, rest = stripped.partition("=")
        if k.strip() != key or not rest.strip().startswith("["):
            continue
        indent = ln[: len(ln) - len(stripped)]
        item_indent = indent + "\t"
        if rest.strip().endswith("]"):
            # single-line list: the block is just this line
            return i, i, indent, item_indent
        for j in range(i + 1, end):
            if "]" in lines[j]:
                break
            body = lines[j].strip()
            if body:
                ws = lines[j][: len(lines[j]) - len(lines[j].lstrip(" \t"))]
                item_indent = ws or item_indent
                break
        close = next(
            (j for j in range(i + 1, end) if lines[j].strip().startswith("]")),
            None,
        )
        if close is None:
            return None
        return i, close, indent, item_indent
    return None


def replace_or_insert_list(
    text: str, table: str, key: str, items: list[str]
) -> str:
    """Surgically set `table.key = [items]` in TOML text: replace the
    existing block preserving its indentation, insert at the end of an
    existing table, or append a new table at EOF — never reformatting
    anything else (tm_tui.py:503-570)."""
    lines = text.splitlines()
    trailing_nl = "\n" if text.endswith("\n") else ""
    rng = find_table_range(lines, table)
    if rng is None:
        lines += ["", f"[{table}]", *format_list_block(key, items)]
        return "\n".join(lines) + trailing_nl

    start, end = rng
    found = _locate_list_block(lines, start, end, key)
    if found is not None:
        bs, be, indent, item_indent = found
        block = format_list_block(key, items, indent, item_indent)
        lines = [*lines[:bs], *block, *lines[be + 1 :]]
        return "\n".join(lines) + trailing_nl

    pad = [""] if end > 0 and lines[end - 1].strip() else []
    block = format_list_block(key, items)
    lines = [*lines[:end], *pad, *block, *lines[end:]]
    return "\n".join(lines) + trailing_nl


def get_list(cfg: dict, table: str, key: str) -> list[str]:
    """Read a dotted-table string list from parsed TOML; non-strings,
    blanks, and duplicates are dropped, first-seen order kept."""
    cur: object = cfg
    for part in table.split("."):
        if not isinstance(cur, dict):
            return []
        cur = cur.get(part)
    if not isinstance(cur, dict) or not isinstance(cur.get(key), list):
        return []
    out, seen = [], set()
    for x in cur[key]:
        if isinstance(x, str) and (name := x.strip()) and name not in seen:
            seen.add(name)
            out.append(name)
    return out


def backup_name(original: Path, stamp: str) -> Path:
    """`tagminder.toml.bak-YYYYMMDD-HHMMSS` beside the original."""
    return original.with_name(f"{original.name}.bak-{stamp}")


# ---------------------------------------------------------------------------
# the matrix model


class ColumnMatrix:
    """State machine of the column-selection screen, UI-free.

    ``members``: "table.key" → set of member columns; ``order``: the
    same path → original list order plus first-add order for toggles.
    """

    def __init__(self, config_text: str) -> None:
        cfg = tomllib.loads(config_text)
        cols_cfg = cfg.get("columns", {}) if isinstance(cfg, dict) else {}
        self.system_prefix = "__"
        if isinstance(cols_cfg, dict):
            sp = cols_cfg.get("system_prefix")
            if isinstance(sp, str) and sp:
                self.system_prefix = sp
        schema = (
            cols_cfg.get("schema_columns") if isinstance(cols_cfg, dict) else None
        )
        self.schema_columns = [
            s.strip()
            for s in (schema if isinstance(schema, list) else [])
            if isinstance(s, str)
            and s.strip()
            and not s.strip().startswith(self.system_prefix)
        ]

        self.members: dict[str, set[str]] = {}
        self.order: dict[str, list[str]] = {}
        universe = set(self.schema_columns)
        for table, key, _label in LIST_SPECS:
            path = f"{table}.{key}"
            items = [
                c
                for c in get_list(cfg, table, key)
                if not c.startswith(self.system_prefix)
            ]
            self.members[path] = set(items)
            self.order[path] = list(items)
            universe.update(items)
        extras = sorted(universe - set(self.schema_columns))
        self.all_columns = [*self.schema_columns, *extras]

    def filtered(self, needle: str | None) -> list[str]:
        q = (needle or "").strip().lower()
        if not q:
            return self.all_columns
        return [c for c in self.all_columns if q in c.lower()]

    def cell(self, path: str, column: str) -> bool:
        return column in self.members.get(path, set())

    def toggle(self, path: str, column: str) -> bool:
        """Flip membership; newly-added columns remember their add order.
        Returns the new membership state."""
        members = self.members.setdefault(path, set())
        if column in members:
            members.remove(column)
            return False
        members.add(column)
        order = self.order.setdefault(path, [])
        if column not in order:
            order.append(column)
        return True

    def final_lists(self) -> dict[str, list[str]]:
        """Per path: surviving members in original+add order, then any
        members never seen in the order log in schema order, deduped —
        the reference's save-ordering contract (tm_tui.py:783-800)."""
        out: dict[str, list[str]] = {}
        for table, key, _label in LIST_SPECS:
            path = f"{table}.{key}"
            members = self.members.get(path, set())
            ordered = [c for c in self.order.get(path, []) if c in members]
            logged = set(self.order.get(path, []))
            ordered += [
                c for c in self.all_columns if c in members and c not in logged
            ]
            seen: set[str] = set()
            out[path] = [
                c for c in ordered if c.strip() and not (c in seen or seen.add(c))
            ]
        return out

    def save(
        self,
        config_path: Path,
        stamp: str,
        write_backup: Callable[[Path, str], None] | None = None,
    ) -> Path:
        """Rewrite only the four list blocks inside the config file,
        after writing a timestamped backup of the original.  The backup
        writer is injectable for tests; default writes beside the file."""
        orig = config_path.read_text(encoding="utf-8")
        bak = backup_name(config_path, stamp)
        if write_backup is None:
            bak.write_text(orig, encoding="utf-8")
        else:
            write_backup(bak, orig)
        text = orig
        lists = self.final_lists()
        for table, key, _label in LIST_SPECS:
            text = replace_or_insert_list(
                text, table, key, lists[f"{table}.{key}"]
            )
        config_path.write_text(text, encoding="utf-8")
        return bak
