"""mbdump member-routing source tests (sources/mbdump.py; reference
scripts/mdm/harvest/harvest_mb_works.py:257-475)."""

from __future__ import annotations

import io
import tarfile

import pytest

from tagminder_spark.sources.mbdump import (
    MEMBER_SPECS,
    parse_member,
    read_member_dir,
    stream_tar_members,
)

WORK_LINES = [
    "1\tw-1\t Work One \t3\t\\N",          # full row, padded title
    "2\tw-2\tWork Two",                     # minimum width (3)
    "\\N\tw-x\tGhost",                      # \N key -> dropped
    "nope\tw-y\tGhost2",                    # unparseable key -> dropped
    "short",                                # width guard -> dropped
    "3\t\\N\t\\N\t\\N\t\\N",               # nulls everywhere but the key
]

LAW_LINES = [
    "10\t100\t200\t300",
    "11\t100\t\\N\t300",   # artist key null -> dropped
    "12\t100\t200",        # width guard -> dropped
]


def test_parse_member_work(spark):
    lines = spark.createDataFrame([(x,) for x in WORK_LINES], "value string")
    rows = {r.work_id: r for r in parse_member(lines, "work").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].work_title == "Work One"          # trimmed
    assert rows[1].work_type_id == 3
    assert rows[2].work_type_id is None              # past end of row
    assert rows[3].musicbrainz_workid is None        # \N -> NULL
    assert rows[3].work_title is None


def test_parse_member_l_artist_work(spark):
    lines = spark.createDataFrame([(x,) for x in LAW_LINES], "value string")
    rows = parse_member(lines, "l_artist_work").collect()
    assert len(rows) == 1
    assert (rows[0].link_id, rows[0].artist_id, rows[0].work_id) == (100, 200, 300)


def test_parse_member_bool_and_fallbacks(spark):
    lines = spark.createDataFrame(
        [("5\t7\ta\tb\tc\td\te\tf\tg\th\tt",), ("6\t8\ta\tb\tc\td\te\tf\tg\th\tno",)],
        "value string",
    )
    rows = {r.link_id: r for r in parse_member(lines, "link").collect()}
    assert rows[5].ended == 1 and rows[6].ended == 0


def _make_tar(tmp_path, members: dict[str, list[str]], name="mbdump.tar.gz"):
    p = tmp_path / name
    with tarfile.open(p, "w:gz") as tar:
        for member, lines in members.items():
            data = ("\n".join(lines) + "\n").encode()
            info = tarfile.TarInfo(name=f"mbdump/{member}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return str(p)


def test_stream_tar_members_routing_and_early_exit(spark, tmp_path):
    tar = _make_tar(
        tmp_path,
        {
            "work": WORK_LINES,
            "l_artist_work": LAW_LINES,
            "ignored_member": ["junk\tjunk"],
        },
    )
    out = stream_tar_members(spark, tar, members=["work", "l_artist_work"])
    assert set(out) == {"work", "l_artist_work"}
    assert out["work"].count() == 3
    assert out["l_artist_work"].count() == 1


def test_read_member_dir(spark, tmp_path):
    root = tmp_path / "dump"
    root.mkdir()
    (root / "work").write_text("\n".join(WORK_LINES) + "\n")
    out = read_member_dir(spark, str(root), members=["work"])
    assert out["work"].count() == 3


def test_member_specs_cover_reference_targets():
    # harvest_mb_works.py:296-311 target_members (15) plus the artists
    # harvest's url / l_artist_url / full artist row (harvest_mb_artists
    # .py:156), plus the relationship harvests' recording / link_full /
    # l_recording_work / l_artist_artist — 22 member layouts routed
    assert len(MEMBER_SPECS) == 22
    for m in ("recording", "link_full", "l_recording_work", "l_artist_artist"):
        assert m in MEMBER_SPECS
    for m in ("url", "l_artist_url", "artist_full"):
        assert m in MEMBER_SPECS
    for m in (
        "link_type", "link", "link_attribute_type",
        "link_attribute_text_value", "link_attribute_credit",
        "link_attribute", "work_type", "language", "artist", "work",
        "work_language", "work_alias", "iswc", "l_artist_work", "l_work_work",
    ):
        assert m in MEMBER_SPECS


@pytest.mark.parametrize("member", sorted(MEMBER_SPECS))
def test_every_member_parses_empty_and_garbage(spark, member):
    lines = spark.createDataFrame(
        [("",), ("\\N",), ("garbage",), ("1\t2\t3\t4\t5\t6\t7\t8\t9\t10\t11",)],
        "value string",
    )
    # must not raise; keys are ints or the row is dropped
    parse_member(lines, member).collect()


def test_resolve_works_language_choice(spark):
    from tagminder_spark.sources.mbdump import resolve_works

    work = spark.createDataFrame(
        [(1, "w-1", "W1", 7, None), (2, "w-2", "W2", None, None)],
        "work_id long, musicbrainz_workid string, work_title string, "
        "work_type_id long, work_disambiguation string",
    )
    wt = spark.createDataFrame([(7, "Song")], "work_type_id long, work_type_name string")
    # work 1: normal rows first, a primary LATER in source order -> the
    # primary must win; work 2: no primary -> first seen wins
    wl = spark.createDataFrame(
        [(1, 10, 0, 100), (1, 11, 0, 101), (1, 12, 1, 102),
         (2, 11, 0, 200), (2, 10, 0, 201)],
        "work_id long, lang_id long, is_primary int, pos long",
    )
    lang = spark.createDataFrame(
        [(10, "en", None, "English", None), (11, None, "de", None, "German"),
         (12, "fr", None, "French", None)],
        "lang_id long, iso_code string, iso_code_fallback string, "
        "lang_name string, lang_name_fallback string",
    )
    alias = spark.createDataFrame(
        [(1, "B alias"), (1, "A alias"), (1, "B alias")],
        "work_id long, alias string",
    )
    iswc = spark.createDataFrame([(2, "T-1")], "work_id long, iswc string")
    rows = {r.work_id: r for r in resolve_works(work, wt, wl, lang, alias, iswc).collect()}
    assert rows[1].work_type_name == "Song"
    assert rows[1].language_code == "fr"          # later primary beats earlier normal
    assert rows[2].language_code == "de"          # fallback column + first-seen
    assert rows[2].language_name == "German"
    assert rows[1].aliases == "A alias\\\\B alias" and rows[1].n_aliases == 2
    assert rows[1].n_iswcs == 0 and rows[2].iswcs == "T-1"


def test_derive_role_labels_precedence(spark):
    from tagminder_spark.sources.mbdump import derive_role_labels

    link = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 12), (4, 13)], "link_id long, link_type_id long"
    )
    lt = spark.createDataFrame(
        [(10, "composer", "wrote", "written by"),   # name wins
         (11, None, "performed", "performance of"),  # fwd wins over rev
         (12, None, None, "revision of"),            # rev
         (13, None, None, None)],                    # attr fallback
        "link_type_id long, rel_name string, link_phrase string, "
        "reverse_link_phrase string",
    )
    la = spark.createDataFrame(
        [(4, 100), (4, 101), (1, 100)], "link_id long, attr_type_id long"
    )
    lat = spark.createDataFrame(
        [(100, "guitar", None), (101, None, "alt101")],
        "attr_type_id long, attr_name string, attr_name_fallback string",
    )
    got = {}
    for r in derive_role_labels(link, lt, la, lat).collect():
        got.setdefault(r.link_id, set()).add(r.role)
    assert got[1] == {"composer"}       # attrs do NOT add when primary exists
    assert got[2] == {"performed"}
    assert got[3] == {"revision of"}
    assert got[4] == {"guitar", "alt101"}  # several labels + name fallback


# ---------------------------------------------------------------------------
# property tests: the parsers' guards hold for arbitrary input lines
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CELL = st.one_of(
    st.just(r"\N"),
    st.just(""),
    st.just("  "),
    st.integers(-5, 5000).map(str),
    st.text(
        alphabet=st.characters(blacklist_characters="\t\n\r", max_codepoint=0x2FF),
        max_size=8,
    ),
)
_LINE = st.lists(_CELL, min_size=0, max_size=12).map("\t".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_LINE, min_size=1, max_size=20))
def test_parse_member_guards_hold_for_arbitrary_lines(spark, lines):
    from tagminder_spark.sources.mbdump import MEMBER_SPECS

    df = spark.createDataFrame([(x,) for x in lines], "value string")
    for member in ("work", "l_artist_work", "link", "url", "artist_full"):
        min_len, cols = MEMBER_SPECS[member]
        rows = parse_member(df, member).collect()
        for r in rows:
            d = r.asDict()
            for name, _, kind in cols:
                if kind == "key":
                    assert d[name] is not None          # key guard
                if kind == "text" and d[name] is not None:
                    v = d[name]
                    assert v == v.strip() and v not in ("", r"\N")  # clean
                if kind == "bool":
                    assert d[name] in (0, 1)
        # row count never exceeds lines that are wide enough
        wide = [x for x in lines if len(x.split("\t")) >= min_len]
        assert len(rows) <= len(wide)


def test_parse_member_matches_reference_model(spark):
    """Pin the Spark parser against a pure-python replay of the
    reference's parse loop for the work member (harvest_mb_works.py
    :411-429) on a tricky fixed corpus."""

    def ref_parse(lines):
        out = []
        for line in lines:
            row = line.split("\t")
            if len(row) < 3:
                continue
            def clean(v):
                if v is None:
                    return None
                t = v.strip()
                return None if t in ("", r"\N") else t
            def to_int(v):
                c = clean(v)
                if c is None:
                    return None
                try:
                    return int(c)
                except ValueError:
                    return None
            wid = to_int(row[0])
            if wid is None:
                continue
            out.append((
                wid, clean(row[1]), clean(row[2]),
                to_int(row[3]) if len(row) > 3 else None,
                clean(row[4]) if len(row) > 4 else None,
            ))
        return sorted(out)

    corpus = [
        "1\tg\t Title \t2\tc",
        "2\tg2\tT2",
        " 3 \tg3\tT3\tnope\t\\N",
        "4\t\\N\t\\N\t\\N",
        "\\N\tg\tT",
        "x\tg\tT",
        "short",
        "5\tg5\tT5\t6\tc5\textra\tcols",
        "6\t  \t\t7",
    ]
    df = spark.createDataFrame([(x,) for x in corpus], "value string")
    got = sorted(
        (r.work_id, r.musicbrainz_workid, r.work_title, r.work_type_id,
         r.work_disambiguation)
        for r in parse_member(df, "work").collect()
    )
    assert got == ref_parse(corpus)


def test_works_lookup_from_member_dict(spark, tmp_path):
    """End-to-end: a member directory routes through read_member_dir and
    works_lookup assembles the final frame from ONE parse per member."""
    from tagminder_spark.sources.mbdump import read_member_dir, works_lookup

    root = tmp_path / "dump"
    root.mkdir()
    files = {
        "work": ["1\tw-1\tSymphony\t7\t\\N", "2\tw-2\tSong Two"],
        "work_type": ["7\tSymphonic"],
        "language": ["3\tde\tGerman"],
        "work_language": ["1\t3\t1"],
        "work_alias": ["0\t1\tAlias A", "0\t1\tAlias B"],
        "iswc": ["0\t2\tT-9"],
        "l_artist_work": ["0\t10\t100\t1"],
        "l_work_work": ["0\t10\t1\t2"],
        "link": ["10\t20\ta\tb\tc\td\te\tf\tg\th\t1"],
        "link_type": ["20\t\\N\t0\tg\tartist\twork\tcomposer\t\\N\tp\tq"],
        "artist": ["100\tam-1\tMaestro"],
    }
    for m, lines in files.items():
        (root / m).write_text("\n".join(lines) + "\n")
    members = read_member_dir(spark, str(root), members=list(files))
    from pyspark.sql import functions as F

    members["work_language"] = members["work_language"].withColumn(
        "pos", F.lit(0)
    )
    rows = {r.work_id: r for r in works_lookup(members).collect()}
    assert rows[1].work_type_name == "Symphonic"
    assert rows[1].language_code == "de" and rows[1].language_name == "German"
    assert rows[1].aliases == "Alias A\\\\Alias B"
    assert rows[1].role_pairs == "composer:Maestro" and rows[1].n_pairs == 1
    assert rows[1].related_work_titles == "Song Two"
    assert rows[2].related_work_titles == "Symphony"
    assert rows[2].iswcs == "T-9" and rows[2].n_pairs == 0


def test_relationship_edges_and_attributes(spark, tmp_path):
    """Recording↔work relationship composition on hand-built members
    (harvest_mb_recording_work_relationships.py:298-535)."""
    from tagminder_spark.sources.mbdump import (
        attach_attributes_json,
        read_member_dir,
        relationship_attributes,
        relationship_edges,
    )

    root = tmp_path / "dump"
    root.mkdir()
    files = {
        # link 10 has full dates+ended; link 11 has a link_type absent
        # from link_type (left-join null); link 99 is referenced by an
        # edge but absent from link (edge must be SKIPPED)
        "link_full": [
            "10\t20\t1950\t6\t1\t1960\t\\N\t\\N\t0\tx\tt",
            "11\t77\t\\N\t\\N\t\\N\t\\N\t\\N\t\\N\t0\tx\t0",
        ],
        "link_type": ["20\t\\N\t0\tg\tartist\twork\tperformance\t\\N\tfwd\trev"],
        "l_recording_work": [
            "1\t10\t500\t900\t0\tcredit-a\t\\N",
            "2\t11\t501\t901\t1\t\\N\tcredit-b",
            "3\t99\t502\t902\t0\t\\N\t\\N",  # missing link -> dropped
            "short",
        ],
        "link_attribute": ["10\t7", "10\t8", "11\t7"],
        "link_attribute_type": ["7\t\\N\t0\talt7\tg7\tguitar", "8\t\\N\t0\talt8\tg8\t\\N"],
        "link_attribute_text_value": ["10\t7\tsolo"],
        "link_attribute_credit": ["10\t8\tas Bob"],
    }
    for m, lines in files.items():
        (root / m).write_text("\n".join(lines) + "\n")
    members = read_member_dir(spark, str(root), members=list(files))

    edges = relationship_edges(
        members["l_recording_work"], members["link_full"], members["link_type"]
    )
    e = {r.edge_row_id: r for r in edges.collect()}
    assert set(e) == {1, 2}  # edge 3's link is absent, short row dropped
    assert e[1].relationship_name == "performance"
    assert e[1].begin_year == 1950 and e[1].end_year == 1960
    assert e[1].is_ended == 1 and e[2].is_ended == 0
    assert e[2].relationship_name is None  # link_type 77 unknown
    assert e[1].entity0_credit == "credit-a" and e[1].entity1_credit is None

    attrs = relationship_attributes(
        edges,
        members["link_attribute"],
        members["link_attribute_type"],
        members["link_attribute_text_value"],
        members["link_attribute_credit"],
    )
    a = {(r.edge_row_id, r.attr_type_id): r for r in attrs.collect()}
    assert a[(1, 7)].attribute_name == "guitar"
    assert a[(1, 7)].attribute_text_value == "solo"
    assert a[(1, 8)].attribute_name == "alt8"  # positional name fallback
    assert a[(1, 8)].credited_as == "as Bob"
    assert a[(2, 7)].attribute_text_value is None
    assert len(a) == 3

    withjson = {r.edge_row_id: r for r in attach_attributes_json(edges, attrs).collect()}
    import json

    parsed = json.loads(withjson[1].attributes_json)
    assert [p["attribute_type_id"] for p in parsed] == [7, 8]  # sorted
    assert parsed[0]["attribute_name"] == "guitar"
    assert parsed[0]["attribute_text_value"] == "solo"
    assert "attributes_json" in withjson[2].asDict()


def test_artist_artist_credit_positions(spark, tmp_path):
    """l_artist_artist reads entity credits from columns 7/8
    (harvest_mb_artist_relationships.py:399-401), not 5/6."""
    from tagminder_spark.sources.mbdump import parse_member

    df = spark.createDataFrame(
        [("1\t10\t100\t200\t0\tf5\tf6\tAs P0\tAs P1",)], "value string"
    )
    row = parse_member(df, "l_artist_artist").first()
    assert row.entity0_credit == "As P0" and row.entity1_credit == "As P1"
    row2 = parse_member(df, "l_recording_work").first()
    assert row2.entity0_credit == "f5" and row2.entity1_credit == "f6"
