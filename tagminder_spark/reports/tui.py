"""Terminal library-explorer analogues (reference: src/tagminder/app/
tm_tui.py — the Textual artist-graph explorer).

The Textual widget layer is driver-side UI and is NOT ported; what is
ported is its engine contract: given the similarity edge frame (the
``g_top_neighbors`` shape), resolve an artist's neighborhood to a fixed
depth. Each frontier expansion is a DISTRIBUTED filter + per-node top-k
on the edge frame (the frontier id set is tiny and broadcasts); only the
rows actually rendered are collected — the same division of labor as the
HTML sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def neighbor_tree(
    edges: DataFrame,
    root: str,
    top_k: int = 10,
    depth: int = 2,
) -> list[tuple[int, str, int]]:
    """(level, node, weight-from-parent) rows in render order.

    ``edges``: (src, dst, weight) — symmetrized (both directions present,
    as g_top_neighbors emits). BFS by level: one distributed top-k query
    per level over the current frontier; already-shown nodes are pruned
    (tm_tui.py's _refresh_neighbors dedups the same way).
    """
    out: list[tuple[int, str, int]] = [(0, root, 0)]
    seen = {root}
    frontier = [root]
    for level in range(1, depth + 1):
        if not frontier:
            break
        w = W.partitionBy("src").orderBy(F.col("weight").desc(), F.col("dst"))
        rows = (
            edges.filter(F.col("src").isin(frontier))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_k)
            .select("src", "dst", "weight")
            .collect()
        )
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(str(r.src), []).append(r)
        next_frontier: list[str] = []
        expanded: list[tuple[int, str, int]] = []
        for parent in frontier:
            for r in by_src.get(parent, []):
                dst = str(r.dst)
                if dst in seen:
                    continue
                seen.add(dst)
                expanded.append((level, dst, int(r.weight)))
                next_frontier.append(dst)
        # splice children under their parents in render order
        merged: list[tuple[int, str, int]] = []
        for row in out:
            merged.append(row)
            if row[0] == level - 1:
                merged.extend(
                    e
                    for e in expanded
                    if any(
                        str(r.dst) == e[1] and str(r.src) == row[1]
                        for r in by_src.get(row[1], [])
                    )
                )
        out = merged
        frontier = next_frontier
    return out


def render_neighbor_tree(
    edges: DataFrame, root: str, top_k: int = 10, depth: int = 2
) -> str:
    """Indented text tree — the terminal twin of the TUI explorer pane."""
    lines = []
    for level, node, weight in neighbor_tree(edges, root, top_k, depth):
        indent = "  " * level
        suffix = f"  (w={weight})" if level else ""
        lines.append(f"{indent}{node}{suffix}")
    return "\n".join(lines)


def search_nodes(
    edges: DataFrame, query: str | None, limit: int = 200
) -> list[tuple[str, int]]:
    """The explorer's search box / starter list (tm_tui.py:271-309):
    blank query → the degree-sorted starter list (top ``limit`` nodes by
    link count, name tiebreak); otherwise case-insensitive substring
    matches with their degrees, capped at ``limit``.

    Distributed: degree is one groupBy over the symmetrized edge frame,
    the substring filter pushes into the scan, and only the rendered
    page is collected.
    """
    degrees = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    q = (query or "").strip().lower()
    if q:
        degrees = degrees.filter(F.lower(F.col("node")).contains(q))
    ranked = degrees.orderBy(
        F.col("degree").desc(), F.lower(F.col("node")).asc()
    ).limit(limit)
    return [(str(r.node), int(r.degree)) for r in ranked.collect()]


def render_search_results(
    edges: DataFrame, query: str | None, limit: int = 200
) -> str:
    """Text twin of the results pane: ``name  (N links)`` per line."""
    return "\n".join(
        f"{n}  ({d} links)" for n, d in search_nodes(edges, query, limit)
    )


class ExplorerSession:
    """Navigation state machine of the artist-graph explorer screen
    (reference tm_tui.py:157-360: _set_current/_history/action_back/
    _refresh_neighbors), decoupled from the widget layer.

    Holds the tiny driver-side state — focus node and back-history — and
    answers every pane refresh with a DISTRIBUTED query over the edge
    frame; only rendered rows are collected.  ``visit`` pushes the old
    focus onto history exactly when it changes (the reference's
    push_history=True path); ``back`` pops without re-pushing.
    """

    def __init__(self, edges: DataFrame, neighbor_limit: int = 300) -> None:
        self.edges = edges
        self.neighbor_limit = neighbor_limit
        self.current: str | None = None
        self.history: list[str] = []

    def visit(self, name: str) -> None:
        name = (name or "").strip()
        if not name:
            return
        if self.current and self.current != name:
            self.history.append(self.current)
        self.current = name

    def back(self) -> bool:
        """Return to the previous focus; False when history is empty
        (the reference rings the bell and stays put)."""
        if not self.history:
            return False
        self.current = self.history.pop()
        return True

    def results(self, query: str | None, limit: int = 200) -> list[tuple[str, int]]:
        """Matches pane: search hits or the degree-sorted starter list."""
        return search_nodes(self.edges, query, limit)

    def neighbors(self) -> list[tuple[str, int]]:
        """Neighbors pane for the focus node: (name, weight), weight
        desc with name tiebreak, capped at ``neighbor_limit``
        (tm_tui.py:345-352 renders the same top slice)."""
        if not self.current:
            return []
        rows = (
            self.edges.filter(F.col("src") == self.current)
            .orderBy(F.col("weight").desc(), F.col("dst").asc())
            .limit(self.neighbor_limit)
            .collect()
        )
        return [(str(r.dst), int(r.weight)) for r in rows]

    def status(self) -> str:
        """The status line (tm_tui.py:338-341)."""
        if not self.current:
            return "Ready. Type to search, then Enter."
        n = len(self.neighbors())
        return (
            f"Focus: {self.current} | neighbors: {n:,d} | "
            f"history: {len(self.history):,d}"
        )
