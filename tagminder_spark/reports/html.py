"""HTML dashboard sink (SURVEY §2.1 S18).

Reference: scripts/reports/92-report-library-health.py:573-660 renders
Plotly figures + tables into a cache dir from already-computed
aggregates. The Spark division of labor is identical and is the point:
ALL aggregation happens distributed; only the final small aggregate rows
are collected and rendered driver-side. Plotly isn't in this container,
so the renderer emits dependency-free static HTML tables — the data path
(aggregate → collect → render → file) is the real, tested part.
"""

from __future__ import annotations

import html
from pathlib import Path

from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; }}
table {{ border-collapse: collapse; margin-bottom: 2rem; }}
th, td {{ border: 1px solid #999; padding: 4px 10px; text-align: left; }}
th {{ background: #eee; }}
caption {{ font-weight: bold; padding: 6px; text-align: left; }}
</style></head><body><h1>{title}</h1>{sections}</body></html>
"""


def _table(caption: str, df: DataFrame, max_rows: int) -> str:
    rows = df.limit(max_rows).collect()
    head = "".join(f"<th>{html.escape(c)}</th>" for c in df.columns)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape('' if v is None else str(v))}</td>" for v in row
        )
        + "</tr>"
        for row in rows
    )
    return (
        f"<table><caption>{html.escape(caption)}</caption>"
        f"<tr>{head}</tr>{body}</table>"
    )


def render_dashboard(
    sections: dict[str, DataFrame],
    out_path: str | Path,
    title: str = "library health",
    max_rows_per_section: int = 100,
) -> Path:
    """Collect each (small, already-aggregated) section DataFrame and
    write one static HTML page. Guard rail: this collects `max_rows` per
    section — feed it aggregates, never fact tables."""
    body = "".join(
        _table(name, df, max_rows_per_section) for name, df in sections.items()
    )
    out = Path(out_path)
    out.write_text(_PAGE.format(title=html.escape(title), sections=body))
    return out


# every 92-library-insights card family the engine ports, in the
# reference page's section order (92-library-insights.py:3519-3600
# assembles persona → format → time → RG → artists → roles → labels →
# genre highlights); each name is a registered, oracle-gated query
INSIGHTS_SECTIONS: tuple[str, ...] = (
    "r92_kpi_tiles",
    "r92_persona",
    "r92_album_stats",
    "r92_format_mix",
    "r92_albums_timeline",
    "r92_acquisition",
    "r92_replaygain",
    "r92_rg_extremes",
    "r92_rg_dynamics",
    "r92_rg_trend",
    "r92_rg_by_genre",
    "r92_artist_depth",
    "r92_albums_per_artist",
    "r92_releasetype_mix",
    "r92_rating_artists",
    "r92_va_share",
    "r92_top_entities",
    "r92_collab_pairs",
    "r92_label_spread",
    "r92_studios",
    "r92_genre_drift",
    "r92_genre_spotlight",
    "r92_genre_composers",
    "r92_spotlight_roles",
    "r92_most_instances",
)


def render_insights_dashboard(
    spark,
    sf_dir: str,
    out_path: str | Path,
    *,
    sections: tuple[str, ...] = INSIGHTS_SECTIONS,
    max_rows_per_section: int = 100,
) -> Path:
    """The full 92-library-insights page: run every ported card family
    from the query registry and render one static page.  The reference
    renders Plotly figures (92-library-insights.py:602-3600); this
    engine computes the SAME aggregates distributed and renders them as
    tables — the analytic content is what the oracle gates pin, the
    figure chrome is driver-side cosmetics."""
    from tagminder_spark.queries import merged

    qs, _ = merged()
    secs = {name: qs[name](spark, sf_dir) for name in sections}
    return render_dashboard(
        secs, out_path,
        title="library insights",
        max_rows_per_section=max_rows_per_section,
    )


def render_artist_map(
    edges: DataFrame,
    out_path: str | Path,
    title: str = "artist similarity map",
    top_k_per_node: int = 30,
    min_weight: int = 1,
    max_nodes: int = 5000,
) -> Path:
    """Self-contained HTML similarity map (SURVEY §2.1; reference
    src/tagminder/ui/tm_artist_map.py:31-64).

    Division of labor mirrors the reference and the dashboard sink: the
    graph (symmetrized, per-node top-k — queries/reports.py
    g_top_neighbors shape) is computed DISTRIBUTED; the renderer only
    collects the already-trimmed edge list, compacts names to integer
    ids (the reference's _trim_graph), and embeds the adjacency as JSON
    into a dependency-free canvas page (no Plotly in this container).

    ``edges``: (src, dst, weight) — directed or symmetric; the renderer
    symmetrizes either way (tm_graph.py:437-449 adds both directions).

    Data contract pinned to the reference (tests/test_runner_reports.py
    golden):

    - node order: ALL graph nodes, case-insensitive sort
      (tm_graph.py:446); ``max_nodes`` (engine safety cap, reference has
      none) keeps the first N in that order.
    - adjacency[id]: neighbors with weight >= min_weight, self-loops
      dropped, ordered (-weight, neighbor lowercase)
      (tm_graph.py:448-449), first ``top_k_per_node`` kept
      (tm_artist_map.py:30-62 _trim_graph).
    - node radius: max(3.0, min(9.5, 2.7 + sqrt(degree))) with degree =
      post-trim neighbor count (tm_artist_map.py:429-433 nodeRadius) —
      computed data-side and embedded, so the contract is testable
      without a JS runtime.
    - link layout distance: base + var / max(1, w) — inverse to weight
      (tm_artist_map.py:389).
    - payload keys: names / adj / r / top_k_per_node / min_weight
      (tm_artist_map.py:80-88, minus the wall-clock generated_at).
    """
    import json
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        F.col("weight"),
    )
    sym = (
        e.unionByName(
            e.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col("weight"),
            )
        )
        .filter((F.col("weight") >= min_weight) & (F.col("src") != F.col("dst")))
        # one adjacency slot per (src, dst): asymmetric duplicate weights
        # (directed inputs) collapse to the max, so a pair can never
        # occupy two of a node's top-k slots
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    # Node list FIRST, bounded and distributed: every edge-bearing node
    # appears as a src after symmetrization, so distinct src = the full
    # node set.  orderBy(lower, raw) matches the reference's
    # case-insensitive sort (tm_graph.py:446) with a deterministic
    # tiebreak; limit() keeps the collect at <= max_nodes rows.
    names = [
        r.src
        for r in sym.select("src")
        .distinct()
        .orderBy(F.lower(F.col("src")).asc(), F.col("src").asc())
        .limit(max_nodes)
        .collect()
    ]
    id_by_name = {n: i for i, n in enumerate(names)}
    kept = sym.sparkSession.createDataFrame(
        [(n,) for n in names], "name string"
    )
    w = W.partitionBy("src").orderBy(
        F.col("weight").desc(), F.lower(F.col("dst")).asc()
    )
    trimmed = (
        # restrict BOTH endpoints to the kept node set before the window
        # and the collect — adjacency below drops out-of-set names anyway,
        # and this caps the driver transfer at max_nodes * top_k rows
        # (the old pre-round-5 bound ADVICE asked to restore)
        sym.join(F.broadcast(kept), sym["src"] == kept["name"], "left_semi")
        .join(F.broadcast(kept), sym["dst"] == kept["name"], "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k_per_node)
        .drop("rn")
    )
    rows = trimmed.collect()
    adj: list[list[list[int]]] = [[] for _ in names]
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(str(r.src), []).append(r)
    for src, rs in by_src.items():
        sid = id_by_name.get(src)
        if sid is None:
            continue
        rs.sort(key=lambda r: (-int(r.weight), str(r.dst).lower()))
        adj[sid] = [
            [id_by_name[str(r.dst)], int(r.weight)]
            for r in rs
            if str(r.dst) in id_by_name
        ]
    radii = [
        round(max(3.0, min(9.5, 2.7 + math.sqrt(len(nb)))), 3) for nb in adj
    ]

    # Payload = the reference's embedded-data contract
    # (tm_artist_map.py:80-88: names/adj/top_k_per_node/min_weight; the
    # wall-clock generated_at is deliberately omitted for deterministic
    # goldens) + this engine's pre-computed radii and the reference's
    # layout constants (tm_artist_map.py:195-201: linkBase 64, linkVar
    # 320, charge -160, collisionPad 26) so the viewer needs no tuning
    # pass of its own.
    payload = json.dumps(
        {
            "names": names,
            "adj": adj,
            "r": radii,
            "top_k_per_node": int(top_k_per_node),
            "min_weight": int(min_weight),
            "layout": {
                "linkBase": 64,
                "linkVar": 320,
                "charge": -160,
                "collisionPad": 26,
            },
        },
        separators=(",", ":"),
    )
    # Interactive viewer (reference surface: search + random focus +
    # reset toolbar, drag-pan, wheel-zoom, hover tooltip, double-click
    # focus). Unlike the reference's CDN d3 force sim, the layout here is
    # a DEPENDENCY-FREE deterministic relaxation: fixed radial seed, no
    # RNG, fixed iteration count — same input, same picture, offline.
    page = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>
html,body{{height:100%;margin:0;font-family:system-ui,sans-serif}}
.wrap{{height:100%;display:grid;grid-template-rows:auto 1fr}}
.bar{{display:flex;gap:8px;align-items:center;padding:8px 10px;
     border-bottom:1px solid rgba(127,127,127,.25)}}
.bar input{{width:min(480px,60vw);padding:6px 8px;border-radius:8px;
     border:1px solid rgba(127,127,127,.35)}}
.bar button{{padding:6px 8px;border-radius:8px;cursor:pointer;
     border:1px solid rgba(127,127,127,.35);background:transparent}}
.hint{{opacity:.7;font-size:12px}} #stamp{{margin-left:auto}}
#stage{{position:relative;overflow:hidden}} canvas{{display:block}}
#tip{{position:absolute;pointer-events:none;padding:5px 7px;
     border-radius:8px;border:1px solid rgba(127,127,127,.35);
     background:rgba(20,20,20,.9);color:#f0f0f0;font-size:12px;
     opacity:0;white-space:nowrap}}
</style></head><body><div class="wrap">
<div class="bar">
  <input id="q" type="text" placeholder="Search artist… (Enter)">
  <button id="random" type="button">Random focus</button>
  <button id="reset" type="button">Reset view</button>
  <div class="hint">Drag to pan, wheel to zoom, double-click to focus.</div>
  <div id="stamp" class="hint"></div>
</div>
<div id="stage"><canvas id="c"></canvas><div id="tip"></div></div>
</div>
<script>
const G = {payload};
const n = G.names.length, L = G.layout;
document.getElementById('stamp').textContent =
  'nodes ' + n + ' | top_k ' + G.top_k_per_node + ' | min_w ' + G.min_weight;
const stage = document.getElementById('stage');
const c = document.getElementById('c'), x = c.getContext('2d');
const tip = document.getElementById('tip');
function fit() {{ c.width = stage.clientWidth || innerWidth;
                  c.height = (stage.clientHeight || innerHeight - 44); }}
fit();
// deterministic layout: radial seed + fixed-iteration spring/repulsion
const P = G.names.map((_, i) => [
  Math.cos(2*Math.PI*i/Math.max(1,n)) * (40 + 14*Math.sqrt(n)),
  Math.sin(2*Math.PI*i/Math.max(1,n)) * (40 + 14*Math.sqrt(n))]);
const E = [];
G.adj.forEach((nb, i) => nb.forEach(([j, w]) => {{ if (i < j) E.push([i, j, w]); }}));
for (let it = 0; it < 120; it++) {{
  const F = P.map(() => [0, 0]);
  for (let i = 0; i < n; i++) for (let j = i + 1; j < n; j++) {{
    let dx = P[j][0]-P[i][0], dy = P[j][1]-P[i][1];
    let d2 = dx*dx + dy*dy + 0.01, d = Math.sqrt(d2);
    const rep = -L.charge / d2, pad = G.r[i] + G.r[j] + L.collisionPad;
    let f = rep + (d < pad ? (pad - d) * 0.6 : 0);
    F[i][0] -= dx/d*f; F[i][1] -= dy/d*f; F[j][0] += dx/d*f; F[j][1] += dy/d*f;
  }}
  E.forEach(([i, j, w]) => {{
    const want = L.linkBase + L.linkVar / Math.max(1, w);
    let dx = P[j][0]-P[i][0], dy = P[j][1]-P[i][1];
    const d = Math.sqrt(dx*dx + dy*dy) + 0.01, f = (d - want) * 0.02;
    F[i][0] += dx/d*f; F[i][1] += dy/d*f; F[j][0] -= dx/d*f; F[j][1] -= dy/d*f;
  }});
  const cool = 1 - it/120;
  for (let i = 0; i < n; i++) {{
    P[i][0] += Math.max(-12, Math.min(12, F[i][0]*0.02)) * cool;
    P[i][1] += Math.max(-12, Math.min(12, F[i][1]*0.02)) * cool;
  }}
}}
let view = null;
function resetView() {{
  let x0=1e9,y0=1e9,x1=-1e9,y1=-1e9;
  P.forEach(p => {{ x0=Math.min(x0,p[0]); y0=Math.min(y0,p[1]);
                   x1=Math.max(x1,p[0]); y1=Math.max(y1,p[1]); }});
  const s = n ? Math.min(c.width/(x1-x0+120), c.height/(y1-y0+120)) : 1;
  view = {{ s: s, tx: c.width/2 - s*(x0+x1)/2, ty: c.height/2 - s*(y0+y1)/2 }};
}}
resetView();
let focus = -1;
function draw() {{
  x.setTransform(1,0,0,1,0,0); x.clearRect(0,0,c.width,c.height);
  x.setTransform(view.s,0,0,view.s,view.tx,view.ty);
  x.strokeStyle = 'rgba(60,60,200,0.25)';
  E.forEach(([i,j,w]) => {{
    x.beginPath(); x.moveTo(P[i][0],P[i][1]); x.lineTo(P[j][0],P[j][1]);
    x.lineWidth = Math.min(4, w)/view.s; x.stroke();
  }});
  x.font = (10/view.s) + 'px sans-serif';
  G.names.forEach((nm, i) => {{
    x.fillStyle = i === focus ? '#c22' : '#222';
    x.beginPath(); x.arc(P[i][0],P[i][1],G.r[i]/Math.sqrt(view.s),0,2*Math.PI);
    x.fill();
    x.fillText(nm, P[i][0] + G.r[i]/Math.sqrt(view.s) + 2, P[i][1]);
  }});
}}
draw();
function focusOn(i) {{
  if (i < 0) return; focus = i;
  view.tx = c.width/2 - view.s*P[i][0]; view.ty = c.height/2 - view.s*P[i][1];
  draw();
}}
document.getElementById('q').addEventListener('keydown', e => {{
  if (e.key !== 'Enter') return;
  const t = e.target.value.toLowerCase();
  focusOn(G.names.findIndex(nm => nm.toLowerCase().includes(t)));
}});
document.getElementById('random').onclick = () =>
  focusOn(n ? (Date.now() % n) : -1);
document.getElementById('reset').onclick = () => {{ focus = -1; resetView(); draw(); }};
let drag = null;
c.onmousedown = e => drag = [e.clientX - view.tx, e.clientY - view.ty];
c.onmouseup = () => drag = null;
c.onmousemove = e => {{
  if (drag) {{ view.tx = e.clientX - drag[0]; view.ty = e.clientY - drag[1]; draw(); return; }}
  const gx = (e.offsetX - view.tx)/view.s, gy = (e.offsetY - view.ty)/view.s;
  let best = -1, bd = 144;
  for (let i = 0; i < n; i++) {{
    const dx = P[i][0]-gx, dy = P[i][1]-gy, d2 = dx*dx+dy*dy;
    if (d2 < bd) {{ bd = d2; best = i; }}
  }}
  if (best >= 0) {{
    tip.textContent = G.names[best] + ' — ' + G.adj[best].length + ' neighbors';
    tip.style.left = (e.offsetX + 12) + 'px'; tip.style.top = (e.offsetY + 12) + 'px';
    tip.style.opacity = 1;
  }} else tip.style.opacity = 0;
}};
c.ondblclick = e => {{
  const gx = (e.offsetX - view.tx)/view.s, gy = (e.offsetY - view.ty)/view.s;
  let best = -1, bd = 400;
  for (let i = 0; i < n; i++) {{
    const dx = P[i][0]-gx, dy = P[i][1]-gy, d2 = dx*dx+dy*dy;
    if (d2 < bd) {{ bd = d2; best = i; }}
  }}
  focusOn(best);
}};
c.onwheel = e => {{
  e.preventDefault();
  const k = e.deltaY < 0 ? 1.15 : 1/1.15;
  view.tx = e.offsetX - k*(e.offsetX - view.tx);
  view.ty = e.offsetY - k*(e.offsetY - view.ty);
  view.s *= k; draw();
}};
</script></body></html>
"""
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(page)
    return out


def render_compare_dashboard(
    deltas: DataFrame,
    out_path: str | Path,
    title: str = "library health compare",
    changelog_summary: DataFrame | None = None,
) -> Path:
    """The compare-HTML sink (reference scripts/snapshots/
    91-snapshot-library-health-after.py:991-1055 writes
    ``tagminder-library-health-compare.html`` from the before/after
    coverage overlay). Input is ``snapshot_compare``'s per-column delta
    frame; bars are rendered as dependency-free inline-block divs (the
    reference uses Plotly — not in this container) with the same
    before/after overlay semantics. Optionally embeds the changelog
    summary table (the "What Changed" panel, :903-918).

    All aggregation stayed distributed; only the per-column delta rows
    (bounded by the column contract) are collected here.
    """
    rows = deltas.collect()

    def bar(v: float | None, color: str) -> str:
        pct = 0.0 if v is None else max(0.0, min(1.0, float(v))) * 100
        return (
            f'<div style="background:{color};width:{pct:.1f}%;'
            f'height:10px"></div>'
        )

    def fmt(v) -> str:
        return "—" if v is None else f"{float(v):.1%}"

    def sign(v) -> str:
        if v is None:
            return "—"
        s = f"{float(v):+.1%}"
        return f'<span style="color:{"#060" if v >= 0 else "#900"}">{s}</span>'

    body = [
        "<table><caption>Tag completeness — before vs after</caption>",
        "<tr><th>column</th><th>track before</th><th>track after</th>"
        "<th>Δ track</th><th>album before</th><th>album after</th>"
        "<th>Δ album</th><th></th></tr>",
    ]
    for r in rows:
        overlay = (
            f'<div style="width:160px">{bar(r.track_before, "#b9a")}'
            f'{bar(r.track_after, "#47a")}</div>'
        )
        body.append(
            "<tr>"
            f"<td>{html.escape(str(r.column))}</td>"
            f"<td>{fmt(r.track_before)}</td><td>{fmt(r.track_after)}</td>"
            f"<td>{sign(r.track_delta)}</td>"
            f"<td>{fmt(r.album_before)}</td><td>{fmt(r.album_after)}</td>"
            f"<td>{sign(r.album_delta)}</td>"
            f"<td>{overlay}</td></tr>"
        )
    body.append("</table>")
    sections = "".join(body)
    if changelog_summary is not None:
        sections += _table("What changed — by column", changelog_summary, 200)
    out = Path(out_path)
    out.write_text(_PAGE.format(title=html.escape(title), sections=sections))
    return out
