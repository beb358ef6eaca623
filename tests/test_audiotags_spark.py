"""Spark-level tests for the real tag-parse path (S3) and the real
export write-back (S11): byte fixtures flow through mapInPandas /
foreachPartition exactly as production files would."""

from __future__ import annotations

import pytest

from tagminder_spark.sources.audiotags import parse_audio
from tagminder_spark.sources.audiotags.synth import (
    build_flac,
    build_mp3_with_xing,
    retag_bytes,
)
from tagminder_spark.sources.catalog import parse_tags, tags_to_columns
from tagminder_spark.sources.export import export_tags, file_writer


def test_parse_tags_real_bytes(spark):
    rows = [
        ("/lib/a.mp3", build_mp3_with_xing(
            {"title": "Mp3 T", "artist": "X\\\\Y", "genre": "(17)"},
            xing_frames=3840, enc=1)),
        ("/lib/b.flac", build_flac(
            44100 * 9,
            [("TITLE", "Flac T"), ("TRACKNUMBER", "4")])),
        ("/lib/c.txt", b"not audio at all"),
    ]
    files = spark.createDataFrame(rows, "path string, content binary")
    wide = tags_to_columns(
        parse_tags(files), ["title", "artist", "track", "genre"]
    ).orderBy("__path")
    a, b, c = wide.collect()
    assert a["__filetype"] == "mp3"
    assert a["title"] == "Mp3 T"
    assert a["artist"] == "X\\\\Y"
    assert a["genre"] == "Rock"
    assert a["__length_seconds"] == str(int(3840 * 1152 / 44100))
    assert b["__filetype"] == "flac"
    assert b["title"] == "Flac T"
    assert b["track"] == "4"
    assert b["__length_seconds"] == "9"
    # unrecognized bytes hit the deterministic fallback, never drop
    assert c["__filetype"] == "txt"
    assert c["title"] == "c.txt"


def test_export_file_writer_roundtrip(spark, tmp_path):
    """The default writer reads, retags, and atomically replaces real
    files; the audio stream survives byte-identical."""
    d = tmp_path / "album"
    d.mkdir()
    flac_path = d / "one.flac"
    mp3_path = d / "two.mp3"
    flac_orig = build_flac(44100 * 21, [("TITLE", "old"), ("GENRE", "G")])
    mp3_orig = build_mp3_with_xing({"title": "old"}, xing_frames=768)
    flac_path.write_bytes(flac_orig)
    mp3_path.write_bytes(mp3_orig)

    df = spark.createDataFrame(
        [
            (str(flac_path), str(d), "New Flac", "Art A\\\\Art B"),
            (str(mp3_path), str(d), "New Mp3", "Solo"),
        ],
        "__path string, __dirpath string, title string, artist string",
    )
    export_tags(df)  # default writer = the real one

    out_f = parse_audio(str(flac_path), flac_path.read_bytes())
    assert out_f["title"] == "New Flac"
    assert out_f["artist"] == "Art A\\\\Art B"
    assert "genre" not in out_f  # omitted cell deletes the tag
    assert out_f["__length_seconds"] == "21"  # STREAMINFO untouched

    out_m = parse_audio(str(mp3_path), mp3_path.read_bytes())
    assert out_m["title"] == "New Mp3"
    assert out_m["artist"] == "Solo"
    assert out_m["__length_seconds"] == str(int(768 * 1152 / 44100))


def test_file_writer_missing_file_raises(spark):
    df = spark.createDataFrame(
        [("/nope/missing.flac", "/nope", "t")],
        "__path string, __dirpath string, title string",
    )
    with pytest.raises(Exception):
        export_tags(df)


def test_retag_unsupported_format_returns_none():
    assert retag_bytes(b"OggS" + b"\x00" * 64, {"title": "t"}) is None


def test_stream_scan_and_parse(spark, tmp_path):
    """Streaming ingest: files landing in a directory flow through the
    binaryFile stream source and the SAME mapInPandas parser; a second
    batch of files is picked up incrementally."""
    from tagminder_spark.sources.catalog import stream_scan_files

    lib = tmp_path / "lib"
    lib.mkdir()
    (lib / "a.flac").write_bytes(
        build_flac(44100 * 5, [("TITLE", "S one")])
    )
    stream = stream_scan_files(spark, str(lib), glob="*.flac")
    assert stream.isStreaming
    parsed = tags_to_columns(parse_tags(stream), ["title"])
    q = (
        parsed.writeStream.format("memory")
        .queryName("tagstream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["title"]
        for r in spark.sql("SELECT title FROM tagstream").collect()
    }
    assert got == {"S one"}

    (lib / "b.flac").write_bytes(
        build_flac(44100 * 6, [("TITLE", "S two")])
    )
    q2 = (
        parsed.writeStream.format("memory")
        .queryName("tagstream2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {
        r["title"]
        for r in spark.sql("SELECT title FROM tagstream2").collect()
    }
    assert {"S one", "S two"} <= got2


def test_parse_tags_path_only_reads_disk(spark, tmp_path):
    """A catalog frame without a content column reads bytes from the
    path inside the executor — the real path-only ingest shape."""
    p = tmp_path / "disk.flac"
    p.write_bytes(build_flac(44100 * 3, [("TITLE", "From Disk")]))
    files = spark.createDataFrame([(str(p),)], "path string")
    wide = tags_to_columns(parse_tags(files), ["title"])
    row = wide.collect()[0]
    assert row["title"] == "From Disk"
    assert row["__filetype"] == "flac"
    assert row["__length_seconds"] == "3"
