"""`tm-spark` CLI — list/describe/run parity with the reference's
tm_cli (src/tagminder/app/tm_cli.py:130-241).

The reference discovers numbered scripts by filename convention and runs
each as a subprocess; here discovery is the explicit registries (pipeline
steps in app/runner.py, queries in queries/) and `run` executes on a
shared SparkSession in-process — one Spark job, not one OS process.

Subcommand contract mirrors tm_cli:
- ``list [--verbose]`` — names, one per line; verbose adds
  tab-separated purpose from the docstring (:166-179).
- ``describe NAME`` — full docstring (:182-193).
- ``run NAME [--sf-dir DIR]`` — execute a registered query against the
  testdata tables and print the row count; unknown names exit with the
  available list, and `.py`-suffix / step-number spellings are accepted
  (:147-163 normalization).
"""

from __future__ import annotations

import argparse
import sys


def _registry() -> dict[str, object]:
    """name -> callable for every runnable unit: pipeline steps by
    number and name, queries by gate name."""
    from tagminder_spark.app import runner
    from tagminder_spark.queries import merged

    out: dict[str, object] = {}
    for num, spec in runner.REGISTRY.items():
        out[f"step{num}-{spec.name}"] = spec.fn
    queries, _ = merged()
    out.update(queries)
    return out


def _resolve(name: str, reg: dict[str, object]):
    normalized = name.strip().removesuffix(".py")
    if normalized in reg:
        return normalized, reg[normalized]
    # step-number spelling: `run 12` → step12-compilations
    matches = [k for k in reg if k.startswith(f"step{normalized}-")]
    if len(matches) == 1:
        return matches[0], reg[matches[0]]
    available = ", ".join(sorted(reg))
    raise SystemExit(f"Unknown name '{name}'. Available: {available}")


def cmd_list(verbose: bool) -> int:
    reg = _registry()
    for k in sorted(reg):
        if not verbose:
            print(k)
            continue
        doc = (getattr(reg[k], "__doc__", "") or "").strip().splitlines()
        purpose = doc[0] if doc else ""
        print(f"{k}\t{purpose}" if purpose else k)
    return 0


def cmd_describe(name: str) -> int:
    reg = _registry()
    key, fn = _resolve(name, reg)
    print(key)
    doc = (getattr(fn, "__doc__", "") or "").strip()
    if doc:
        print("\n--- Docstring ---\n")
        print(doc)
    return 0


def cmd_run(name: str, sf_dir: str) -> int:
    from tagminder_spark.queries import merged
    from tagminder_spark.session import get_spark

    queries, _ = merged()
    key, fn = _resolve(name, queries)  # run is query-registry only
    spark = get_spark("tm-spark-cli")
    n = fn(spark, sf_dir).count()
    print(f"{key}: {n} rows")
    return 0


def cmd_insights(sf_dir: str, out: str) -> int:
    """Render the full library-insights page (the reference's
    92-library-insights.py run) — every ported card family computed
    distributed and written as one static HTML file."""
    from tagminder_spark.reports.html import render_insights_dashboard
    from tagminder_spark.session import get_spark

    spark = get_spark("tm-spark-insights")
    path = render_insights_dashboard(spark, sf_dir, out)
    print(f"wrote {path}")
    return 0


def cmd_tui(screen_name: str, sf_dir: str, config: str | None) -> int:
    """Interactive screens (reference tm_tui.py): ``colsel`` edits the
    column-selection lists of a tagminder.toml in place; ``explorer``
    browses the artist co-occurrence graph built from the testdata."""
    import datetime
    from pathlib import Path

    from tagminder_spark.app.tui_runtime import (
        ColumnMatrixScreen,
        ExplorerScreen,
        run,
    )

    if screen_name == "colsel":
        from tagminder_spark.app.colsel import ColumnMatrix

        if not config:
            raise SystemExit("tui colsel requires --config PATH")
        path = Path(config)
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        screen = ColumnMatrixScreen(
            ColumnMatrix(path.read_text(encoding="utf-8")), path, stamp=stamp
        )
    elif screen_name == "explorer":
        from tagminder_spark.queries import merged
        from tagminder_spark.reports.tui import ExplorerSession
        from tagminder_spark.session import get_spark

        queries, _ = merged()
        spark = get_spark("tm-spark-tui")
        edges = queries["g_top_neighbors"](spark, sf_dir)
        screen = ExplorerScreen(ExplorerSession(edges))
    else:
        raise SystemExit(f"unknown screen '{screen_name}' (colsel|explorer)")
    run(screen)
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="tm-spark",
        description="List, describe, and run tagminder-spark steps/queries.",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    p_list = sub.add_parser("list", help="List runnable steps and queries")
    p_list.add_argument("--verbose", action="store_true")
    p_desc = sub.add_parser("describe", help="Show a unit's docstring")
    p_desc.add_argument("name")
    p_run = sub.add_parser("run", help="Run a registered query")
    p_run.add_argument("name")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_tui = sub.add_parser("tui", help="Interactive screens (colsel|explorer)")
    p_tui.add_argument("screen", choices=("colsel", "explorer"))
    p_tui.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_tui.add_argument("--config")
    p_ins = sub.add_parser(
        "insights", help="Render the library-insights HTML page"
    )
    p_ins.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_ins.add_argument("--out", default="library-insights.html")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "list":
        return cmd_list(verbose=bool(args.verbose))
    if args.command == "describe":
        return cmd_describe(args.name)
    if args.command == "run":
        return cmd_run(args.name, args.sf_dir)
    if args.command == "tui":
        return cmd_tui(args.screen, args.sf_dir, args.config)
    if args.command == "insights":
        return cmd_insights(args.sf_dir, args.out)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
