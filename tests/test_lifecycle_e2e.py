"""Full-library file-level lifecycle e2e (VERDICT r6 #2).

The loop the reference runs daily (`tags2db.py` §3.1 import → pipeline →
export), composed from the engine's real pieces over a REAL directory
tree: synthesize 504 files across all 8 container families (disc
subfolders included) → ``scan_files`` → ``parse_tags`` (bounded lazy IO)
→ alib parquet → three pipeline steps through diff-audit MERGE (S5) →
``export_tags`` write-back (streaming writer) → re-scan + re-parse,
asserting tag equality against the final alib, stream preservation
(duration + raw audio markers), and the ``__sqlmodded`` reset (99)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

# columns that round-trip exactly through every container's writer+parser
KEEP = ["title", "artist", "album", "composer", "genre", "track", "year"]
PIVOT = KEEP + ["writer", "arranger", "lyricist"]

_GENRES = ("Rock", "Ambient", "Electronic", "Jazz",
           "Blues", "Classical", "Folk", "Techno")
_EXTS = (".mp3", ".flac", ".ogg", ".m4a", ".aiff", ".wma", ".ape", ".wv")

N_FILES = 504


def _build_library(root) -> dict[str, dict]:
    """Synthesize a multi-format tree; returns path → build tags."""
    from tagminder_spark.sources.audiotags.synth import (
        build_aiff,
        build_ape,
        build_asf,
        build_flac,
        build_m4a,
        build_mp3_with_xing,
        build_ogg_vorbis,
        build_wavpack,
    )

    specs: dict[str, dict] = {}
    for i in range(N_FILES):
        fmt = i % 8
        seconds = (i % 300) + 30
        tags = {
            "title": f"Song {i}é" + ("   " if i % 3 == 0 else ""),
            "artist": f"Artist {i % 7}",
            "album": f"Album {i % 13}",
            "composer": f"Comp {i % 11}",
            "genre": _GENRES[fmt],
            "track": str(i % 15 + 1),
            # i%4==1 rows carry a step-20-normalizable date
            "year": "1999/03/07" if i % 4 == 1 else "1987",
        }
        if i % 6 == 2 and fmt != 5:  # step-04 fodder (ASF stays 1-valued)
            tags["writer"] = f"Writer {i % 9}"
        if fmt == 0:
            content = build_mp3_with_xing(tags, xing_frames=seconds * 38)
        elif fmt == 1:
            content = build_flac(
                44100 * seconds, list(tags.items()), audio_bytes=64
            )
        elif fmt == 2:
            content = build_ogg_vorbis(list(tags.items()), 44100 * seconds)
        elif fmt == 3:
            content = build_m4a(tags, seconds)
        elif fmt == 4:
            content = build_aiff(tags, seconds)
        elif fmt == 5:
            content = build_asf(tags, seconds)
        elif fmt == 6:
            content = build_ape(tags, seconds)
        else:
            content = build_wavpack(tags, seconds)
        d = root / f"Artist_{i % 7}" / f"Album_{i % 13}"
        if i % 3 == 0:
            d = d / f"Disc_{i % 2 + 1}"
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{i:04d}_track{_EXTS[fmt]}"
        p.write_bytes(content)
        specs[str(p)] = tags
    return specs


def test_full_library_lifecycle(spark, tmp_path):
    from tagminder_spark.operators.diff_audit import merge_into_parquet
    from tagminder_spark.pipeline.steps import (
        run_step,
        step02_clean_text,
        step04_merge_writers,
        step20_dates,
    )
    from tagminder_spark.sources.catalog import (
        parse_tags,
        scan_files,
        tags_to_columns,
    )
    from tagminder_spark.sources.export import (
        export_projection,
        export_tags,
        reset_sqlmodded,
    )

    root = tmp_path / "library"
    table = str(tmp_path / "alib")
    chdir = str(tmp_path / "changelog")
    specs = _build_library(root)

    # ---- ingest: scan → parse → alib parquet -------------------------
    scanned = scan_files(spark, str(root))
    assert scanned.count() == N_FILES
    parsed = tags_to_columns(parse_tags(scanned.select("path")), PIVOT)
    alib = parsed.withColumn(
        "__dirpath", F.regexp_replace("__path", "/[^/]+$", "")
    ).withColumn("__sqlmodded", F.lit(None).cast("smallint"))
    pre = {r["__path"]: r.asDict() for r in alib.collect()}
    assert set(pre) == set(specs)
    # every format family parsed for real
    assert {r["__filetype"] for r in alib.select("__filetype").collect()} == {
        "mp3", "flac", "ogg", "mp4", "aiff", "asf", "ape", "wavpack"
    }
    alib.write.parquet(table)

    # ---- pipeline: three steps through diff-audit MERGE (S5) ---------
    chain = [
        (lambda df: step02_clean_text(df, ("title", "album", "composer")),
         ["title", "album", "composer"], "02"),
        (step04_merge_writers, ["composer"], "04"),
        (step20_dates, ["year"], "20"),
    ]
    for fn, cols, script in chain:
        cur = spark.read.parquet(table)
        updated, changelog = run_step(cur, fn, cols, script)
        merge_into_parquet(
            spark, table, updated, "__path",
            changelog=changelog, changelog_dir=chdir,
        )

    final = spark.read.parquet(table)
    chlog = spark.read.parquet(chdir)
    changed_paths = {
        r["alib_path"] for r in chlog.select("alib_path").distinct().collect()
    }
    assert changed_paths, "pipeline produced no changes — test data broken"
    assert {r["script"] for r in chlog.select("script").distinct().collect()
            } == {"02", "04", "20"}
    # the three dirty shapes all fired
    cols_changed = {
        r["alib_column"]
        for r in chlog.select("alib_column").distinct().collect()
    }
    assert {"title", "composer", "year"} <= cols_changed

    # ---- export: changed rows written back through the REAL writer ---
    proj = export_projection(final, KEEP, changelog=chlog)
    to_write = proj.filter(F.col("__sqlmodded") > 0)
    n_export = to_write.count()
    assert n_export == len(changed_paths)
    mtimes = {p: os.stat(p).st_mtime_ns for p in specs}
    export_tags(to_write)
    rewritten = {p for p in specs if os.stat(p).st_mtime_ns != mtimes[p]}
    assert rewritten == changed_paths  # exactly the dirty files touched

    # ---- re-scan + re-parse: files now carry the pipeline's values ---
    parsed2 = tags_to_columns(
        parse_tags(scan_files(spark, str(root)).select("path")), PIVOT
    )
    post = {r["__path"]: r.asDict() for r in parsed2.collect()}
    fin = {r["__path"]: r.asDict() for r in final.collect()}
    assert set(post) == set(fin) == set(pre)
    for p, want in fin.items():
        got = post[p]
        for c in KEEP:
            assert got[c] == want[c], (p, c, got[c], want[c])
        # stream preserved: duration and container identity survive
        assert got["__length_seconds"] == pre[p]["__length_seconds"], p
        assert got["__filetype"] == pre[p]["__filetype"], p

    # non-exported tags are deleted from rewritten files (empty⇒delete),
    # retained on untouched ones
    for p, tags in specs.items():
        if "writer" not in tags:
            continue
        if p in changed_paths:
            assert post[p]["writer"] is None, p
        else:
            assert post[p]["writer"] == tags["writer"], p

    # raw audio markers survive the rewrite byte-for-byte
    for p in sorted(changed_paths):
        if p.endswith((".ogg", ".aiff", ".wma", ".ape", ".wv")):
            with open(p, "rb") as fh:
                assert b"\xaa" * 32 in fh.read(), p

    # ---- 99: reset the dirty flag -------------------------------------
    reset = reset_sqlmodded(final)
    assert reset.filter(F.col("__sqlmodded").isNotNull()).count() == 0
