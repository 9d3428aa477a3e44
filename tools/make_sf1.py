"""Materialize a 10x ("sf1") rehearsal dataset from the driver's sf0.1 data.

Verdict r3 item 7: ground the 100 TB story with one honest 10x data point.
The driver only ships sf{0.001,0.01,0.1}; this tool scales sf0.1 -> sf1 under
.scratch/sf1 (gitignored) for the scale rehearsal in tools/scale_rehearsal.py.

Scaling must preserve the WORKLOAD SHAPE, not just the row count:

- ``documents`` x10: replica r >= 1 gets ``doc_id + r*10_000_000`` and every
  whitespace token suffixed with a replica marker (one regexp_replace). The
  marker makes shingle/word spaces DISJOINT across replicas, so each replica
  carries exactly sf0.1's duplicate structure and nothing is a near-dup of
  another replica — i.e. a constant-duplicate-rate 10x corpus. Naive verbatim
  replication would instead put every doc in a 10-clone group and inflate the
  LSH bucket-pair term quadratically (100x pairs on 10x data), which is NOT
  what a bigger corpus looks like.
- ``lineitem`` x10: replica r >= 1 gets ``l_orderkey + r*100_000_000``; value
  columns verbatim (agg/join key cardinality scales with data, per-key row
  counts stay constant — the TPC-H scaling rule).
- every other table: symlinked verbatim (dimensions don't scale 1:1 with
  facts, and the rehearsal queries only read documents/lineitem).

Deterministic: pure SQL over the driver parquet, no RNG, no timestamps.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
REPLICAS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS rep")

    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.rep * 10000000 AS doc_id,
                 CASE WHEN r.rep = 0 THEN d.text
                      ELSE regexp_replace(d.text, '(\\S+)', '\\1zz' || r.rep, 'g')
                 END AS text,
                 d.lang, d.source,
                 CASE WHEN r.rep = 0 THEN d.n_chars
                      ELSE len(regexp_replace(d.text, '(\\S+)', '\\1zz' || r.rep, 'g'))
                 END AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') d CROSS JOIN r
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )

    con.execute(
        f"""
        COPY (
          SELECT l.l_orderkey + r.rep * 100000000 AS l_orderkey,
                 l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
                 l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
                 l.l_linestatus, l.l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet') l CROSS JOIN r
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings x10: replica r rotates each vector's components by r
    # positions — an orthogonal transform, so every within-replica pairwise
    # cosine (and every norm) is exactly preserved: each replica carries
    # sf0.1's similarity structure, replicas are mutually ~random. That is a
    # constant-near-dup-rate 10x vector corpus, the analogue of the
    # token-suffix trick for documents.
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.rep * 10000000 AS vec_id,
                 CASE WHEN r.rep = 0 THEN e.embedding
                      ELSE list_concat(e.embedding[r.rep + 1:],
                                       e.embedding[1:r.rep])
                 END AS embedding,
                 e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e CROSS JOIN r
          ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    # events x10: replica r offsets user_id/event_id, keeps ts/type/value —
    # 10x users with identical per-user event streams (per-user session and
    # window shapes constant, total volume 10x).
    con.execute(
        f"""
        COPY (
          SELECT ev.event_id + r.rep * 100000000 AS event_id, ev.ts,
                 ev.user_id + r.rep * 10000000 AS user_id,
                 ev.event_type, ev.value, ev.props
          FROM read_parquet('{SRC}/events.parquet') ev CROSS JOIN r
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
    ):
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)

    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/documents.parquet')").fetchone()[0]
    m = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/lineitem.parquet')").fetchone()[0]
    print(f"sf1 ready at {DST}: documents={n} lineitem={m}")


if __name__ == "__main__":
    main()
