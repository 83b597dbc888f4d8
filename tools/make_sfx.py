#!/usr/bin/env python3
"""Synthesize a larger-SF derivative of an existing testdata directory by
unioning N key-shifted copies of each table, preserving distributions and
referential integrity — scratch-space input for a 4th decade on the
SCALING.md curve (testdata itself is read-only).

Construction (copy index i in 0..N-1; copy 0 is the original, byte-equal):

- region / nation: dimensions — kept as-is (TPC-H keeps them constant
  across SF too).
- customer / supplier / part / orders / lineitem: every key column is
  shifted by ``i * stride(table)`` with one shared stride per key space,
  so FK joins land on exactly the shifted partner row (orders of copy i
  join customers of copy i; join fan-out per key is unchanged). part's
  p_name/p_type additionally get the per-copy affine letter permutation
  (lower/upper alphabet) so the entity-resolution corpus built from part
  text keeps the ORIGINAL match rate instead of gaining N-1 verbatim
  twins per part (p_brand/p_size stay fixed — TPC-H holds brand
  cardinality constant across SF).
- events: event_id / user_id shifted; ts / value / props untouched, so
  the time window densifies 10x (same effect as a 10x event rate).
- documents: doc_id shifted; for i>0 the text gets a per-copy affine
  letter permutation of [a-z] (x -> a*x+b mod 26; 312 distinct maps, so
  copies stay pairwise-distinct up to a 312-copy build; copies 1..25
  reduce to the classic Caesar rotation). Length-, whitespace- and
  dup-structure-preserving.
  Within-copy duplicate/near-dup structure is EXACTLY the original's;
  cross-copy shingle Jaccard ~ 0 — so the global duplicate RATE matches
  the original corpus instead of every doc gaining 9 near-identical
  twins (which would blow up any LSH candidate count ~10x beyond what a
  real 10x corpus produces).
- embeddings: vec_id shifted; the vector is rotated by i positions,
  with a sign flip once i exceeds one full rotation period (norm- and
  pairwise-distance-preserving within a copy, decorrelated across
  copies, pairwise-distinct up to 2*dim copies). label kept.

Usage: python tools/make_sfx.py [src_dir] [dst_dir] [n_copies]
Defaults: /root/testdata/sf0.1 /tmp/spark-graft-sf1 10
(5th decade: python tools/make_sfx.py /root/testdata/sf0.1 /tmp/spark-graft-sf10 100)
"""

from __future__ import annotations

import os
import sys

import duckdb

# one stride per key space (dense 0-based keys in the generated testdata;
# stride = max+1 so shifted copies never collide)
STRIDES = {
    "cust": 15000,
    "supp": 1000,
    "part": 20000,
    "order": 150000,
    "event": 100000,
    "user": 1500,
    "doc": 5000,
    "vec": 2000,
}

ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Units of Z/26 — the valid multipliers of an affine cipher x -> a*x + b
# (mod 26). 12 units x 26 shifts = 312 distinct length-preserving letter
# permutations: enough unique per-copy text transforms for a 100-copy
# (sf10) build. a=1 (the first unit) reduces to the Caesar rotation, so
# copies 0..25 are byte-identical to what the original Caesar-only
# builder produced (copy 0 = identity = the untouched original).
_UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _rot_alpha(i: int) -> str:
    a = _UNITS[(i // 26) % len(_UNITS)]
    b = i % 26
    return "".join(ALPHA[(a * k + b) % 26] for k in range(26))


def table_sql(table: str, src: str, n: int, scale: dict[str, int]) -> str:
    """One SELECT producing the n-copy union for ``table``.

    Uses a cross join against range(n) so DuckDB streams the copies in a
    single pass over the source parquet.
    """
    p = f"'{src}/{table}.parquet'"
    c = "c.i"
    if table in ("region", "nation"):
        return f"SELECT * FROM {p}"
    if table == "customer":
        return (
            f"SELECT c_custkey + {c} * {scale['cust']} AS c_custkey, c_name, "
            f"c_nationkey, c_acctbal, c_mktsegment "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {c} * {scale['supp']} AS s_suppkey, s_name, "
            f"s_nationkey, s_acctbal "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "part":
        # p_name/p_type get the SAME per-copy affine letter permutation as
        # documents (lowercase resp. uppercase alphabet): a verbatim copy
        # made every part's entity string (name+brand+type+size) appear
        # 10/100× in the catalog, turning entity-resolution candidate sets
        # quadratic in the copy count (measured: fuzzy_entity_match emitted
        # 3.56M matches at sf1 vs ~20k at sf0.1 and OOMed the 8 GB replica
        # heap). Permuted names/types keep cross-copy token Jaccard below
        # the LSH threshold, so the match RATE matches the original catalog
        # — the same dup-rate-preservation argument as documents. p_brand
        # (25-value categorical itemset key) and p_size stay fixed, like
        # TPC-H keeps brand cardinality constant across SF.
        upper = ALPHA.upper()
        name_whens = " ".join(
            f"WHEN {i} THEN translate(p_name, '{ALPHA}', '{_rot_alpha(i)}')"
            for i in range(1, n)
        )
        type_whens = " ".join(
            f"WHEN {i} THEN translate(p_type, '{upper}', '{_rot_alpha(i).upper()}')"
            for i in range(1, n)
        )
        pname = f"CASE {c} {name_whens} ELSE p_name END" if n > 1 else "p_name"
        ptype = f"CASE {c} {type_whens} ELSE p_type END" if n > 1 else "p_type"
        return (
            f"SELECT p_partkey + {c} * {scale['part']} AS p_partkey, "
            f"{pname} AS p_name, "
            f"p_brand, {ptype} AS p_type, p_size, p_retailprice "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {c} * {scale['order']} AS o_orderkey, "
            f"o_custkey + {c} * {scale['cust']} AS o_custkey, "
            f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {c} * {scale['order']} AS l_orderkey, "
            f"l_partkey + {c} * {scale['part']} AS l_partkey, "
            f"l_suppkey + {c} * {scale['supp']} AS l_suppkey, "
            f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            f"l_returnflag, l_linestatus, l_shipdate "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "events":
        return (
            f"SELECT event_id + {c} * {scale['event']} AS event_id, ts, "
            f"user_id + {c} * {scale['user']} AS user_id, event_type, value, props "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "documents":
        # per-copy Caesar rotation; CASE per copy index keeps it one pass
        whens = " ".join(
            f"WHEN {i} THEN translate(text, '{ALPHA}', '{_rot_alpha(i)}')"
            for i in range(1, n)
        )
        rot = f"CASE {c} {whens} ELSE text END" if n > 1 else "text"
        return (
            f"SELECT doc_id + {c} * {scale['doc']} AS doc_id, {rot} AS text, "
            f"lang, source, n_chars "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    if table == "embeddings":
        # rotate the 64-dim vector by i: distance-preserving within a copy.
        # Past one full rotation period (copy index >= dim, reachable only
        # in a >=64-copy build like sf10) also flip the sign — still norm-
        # and pairwise-distance-preserving, and it keeps copies i and
        # i+dim from carrying identical vectors under shifted ids.
        rot = (
            f"(embedding[(({c}) % len(embedding)) + 1 :] || "
            f" embedding[1 : (({c}) % len(embedding))])"
        )
        signed = (
            f"CASE WHEN (({c}) // len(embedding)) % 2 = 1 "
            f"THEN list_transform({rot}, x -> -x) ELSE {rot} END"
        )
        return (
            f"SELECT vec_id + {c} * {scale['vec']} AS vec_id, "
            f"({signed})::FLOAT[] AS embedding, "
            f"label "
            f"FROM {p}, (SELECT unnest(range({n})) AS i) c"
        )
    raise ValueError(table)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    # An interrupted run leaves a partial directory; the marker is written
    # LAST so downstream tools (tools/certify_sf1.py) can distinguish a
    # complete derivative from a torso without probing every parquet.
    marker = os.path.join(dst, "_COMPLETE")
    if os.path.exists(marker):
        os.remove(marker)
    con = duckdb.connect()
    # sanity-pin DuckDB's 1-based inclusive list slicing before relying on it
    assert con.sql("SELECT [1,2,3,4][2:] || [1,2,3,4][1:1]").fetchone()[0] == [2, 3, 4, 1]
    for table in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        sql = table_sql(table, src, n, STRIDES)
        out = f"{dst}/{table}.parquet"
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {rows} rows -> {out}")
    con.close()
    with open(marker, "w") as f:
        f.write(f"src={src} n={n}\n")


if __name__ == "__main__":
    main()
