"""Graph-analytics gates: PageRank over the customer↔supplier purchase
graph. Vertices are every customer and supplier (isolated vertices kept —
they are the dangling/teleport-only case); edges are the distinct
(customer, supplier) purchase pairs from orders ⋈ lineitem, both
directions. Ranks live on an integer ppm grid (see operators/graph.py)
so the unrolled-CTE oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import graph as G
from .base import Q, load


def graph_pagerank(spark, sf_dir):
    """3-iteration integer-grid PageRank (operators/graph.py::pagerank)
    over the bipartite purchase graph. Node encoding: customer c →
    2c, supplier s → 2s+1 (collision-free in one BIGINT key space).
    The edge list is built once from one orders ⋈ lineitem pass and
    reused across rounds; each round is one equi-join + one partial-agg
    grouped sum — the connected-components scale shape."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("ck"),
            F.col("l_suppkey").cast("long").alias("sk"),
        )
        .distinct()
    )
    edges = pairs.select(
        (F.col("ck") * 2).alias("src"), (F.col("sk") * 2 + 1).alias("dst")
    ).unionByName(
        pairs.select((F.col("sk") * 2 + 1).alias("src"), (F.col("ck") * 2).alias("dst"))
    )
    nodes = (
        load(spark, sf_dir, "customer")
        .select((F.col("c_custkey").cast("long") * 2).alias("node"))
        .unionByName(
            load(spark, sf_dir, "supplier").select(
                (F.col("s_suppkey").cast("long") * 2 + 1).alias("node")
            )
        )
    )
    return G.pagerank(nodes, edges).orderBy("node")


GRAPH_PAGERANK_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS ck,
                  CAST(l.l_suppkey AS BIGINT) AS sk
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT sk * 2 + 1, ck * 2 FROM pairs
),
nodes AS (
  SELECT CAST(c_custkey AS BIGINT) * 2 AS node FROM customer
  UNION
  SELECT CAST(s_suppkey AS BIGINT) * 2 + 1 FROM supplier
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, CAST({G.PR_INIT_PPM} AS BIGINT) AS rank_ppm FROM nodes),
{G.pagerank_oracle_iterations()}
SELECT node, rank_ppm FROM r{G.PR_ITERATIONS} ORDER BY node
"""


QUERIES = {
    "graph_pagerank": Q(
        graph_pagerank,
        GRAPH_PAGERANK_SQL,
        "3-iteration integer-grid PageRank over the purchase graph",
    ),
}
