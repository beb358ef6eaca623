"""One-off sf~1 corpus generator for the scale-exponent measurement
(BASELINE.md §8): ~10x the sf0.1 documents/lineitem tables, written to
.scaledata/sf1/ (gitignored).

Replication preserves WORKLOAD SHAPE, not just row count:

- documents: 10 replicas; replica k suffixes every token with ``_rk`` so
  replicas share no word shingles — near-dup/exact-dup structure (and
  therefore candidate-pair and cluster counts) scales linearly with the
  corpus instead of exploding into cross-replica 10-cliques that a naive
  copy would create. doc_id shifts by k*10M; lang/source distributions
  (and their skew) are preserved, so per-stratum window work grows 10x.
- lineitem: 10 replicas with l_orderkey shifted by k*10M (keeps every
  fixture's modular key derivation uniformly distributed).

Usage: python tools/make_scaledata.py [replicas]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = Path(__file__).resolve().parent.parent / ".scaledata" / "sf1"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source,
                 -- keep the corpus invariant n_chars = length(text):
                 -- replica texts grow with the _rk suffixes, and a
                 -- stale n_chars made t_quality_score's oracle diverge
                 -- from the Spark side in the round-6 sf1 value sweep
                 length(text) AS n_chars
          FROM (
            SELECT d.doc_id + r.range * 10000000 AS doc_id,
                   CASE WHEN r.range = 0 THEN d.text
                        ELSE replace(d.text, ' ', '_r' || r.range || ' ')
                             || '_r' || r.range END AS text,
                   d.lang, d.source
            FROM read_parquet('{SRC}/documents.parquet') d,
                 range({replicas}) r
          )
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT li.* REPLACE (li.l_orderkey + r.range * 10000000
                               AS l_orderkey)
          FROM read_parquet('{SRC}/lineitem.parquet') li,
               range({replicas}) r
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    # per-(replica, dim) sign flips: an isometry WITHIN a replica (dot
    # products, hence the near-dup pair structure, are exactly
    # preserved) while cross-replica cosines decorrelate — a naive copy
    # or rotation keeps replicas correlated and explodes the candidate
    # count super-linearly
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.range * 10000000 AS vec_id,
                 CASE WHEN r.range = 0 THEN e.embedding
                      ELSE [CASE WHEN CAST('0x' || substr(md5(
                                 r.range || ':' || i), 1, 1) AS INT)
                                 % 2 = 0
                            THEN e.embedding[i] ELSE -e.embedding[i] END
                            for i in range(1, len(e.embedding) + 1)]
                      END AS embedding,
                 e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e,
               range({replicas}) r
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # orders/events replicate with the SAME key shift as lineitem so the
    # orderkey join structure is preserved; dim tables copy unreplicated
    # (a bigger fact over the same dims is exactly how warehouses grow)
    con.execute(
        f"""
        COPY (
          SELECT o.* REPLACE (o.o_orderkey + r.range * 10000000
                              AS o_orderkey)
          FROM read_parquet('{SRC}/orders.parquet') o, range({replicas}) r
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.* REPLACE (e.event_id + r.range * 10000000 AS event_id)
          FROM read_parquet('{SRC}/events.parquet') e, range({replicas}) r
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ("documents", "lineitem", "embeddings", "orders", "events"):
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
