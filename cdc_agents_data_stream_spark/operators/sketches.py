"""Distributed sketches with engine-exact determinism.

``approx_count_distinct`` is the right call in production, but its HLL++
registers are engine-private — an external oracle cannot check them. This
module implements classic HyperLogLog from the md5 hash family the engine
uses everywhere, designed so EVERY intermediate is exact integer
arithmetic:

- register index = h mod m, remainder w = h div m (integer ops on the
  60-bit md5 prefix — no float division anywhere near the hash);
- rho = leading zeros of w in its 51-bit width + 1, computed from the
  LENGTH OF THE BINARY STRING (``conv(w, 10, 2)`` / ``bin(w)``), not
  ``log2`` — string length is deterministic where libm is not;
- the harmonic sum Σ 2^(-M_j) is scaled by 2^RHO_CAP so it is an exact
  int64 SUM (order-free, cross-engine hashable); the float estimate is
  derived from that integer at the very end by one deterministic
  division chain.

Bias corrections (small/large-range) are deliberately omitted: they need
``ln``, whose rounding is libm-specific. The raw estimate is within the
standard ~1.04/sqrt(m) ≈ 4.6% at m=512 for the cardinalities the gate
exercises, and the hard signal is the exact register sum anyway.

Scale shape: one partial-aggregated max per (group, register) — shuffle
rows bounded by groups × m regardless of input size — then a tiny
per-group rollup; the classic two-level sketch merge (register-wise max)
is exactly what the partial aggregation performs, so this parallelizes
the same way the built-in HLL does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_B = 9
HLL_M = 1 << HLL_B  # 512 registers
RHO_CAP = 40  # keeps 2^(RHO_CAP - rho) an exact int64 term
_W_BITS = 60 - HLL_B  # md5 prefix bits after the register index
# alpha_m for m = 512 (Flajolet et al.): 0.7213 / (1 + 1.079/m), one
# shared literal so both engines run the identical constant
HLL_ALPHA = round(0.7213 / (1 + 1.079 / HLL_M), 6)


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``value_col`` with the
    exact integer register sum exposed: (group, n_buckets_hit,
    register_sum, hll_estimate)."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    prepared = df.select(
        F.col(group_col),
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.expr(
            f"CAST(conv(substring(md5(CAST({value_col} AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT) DIV {HLL_M}"
        ).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS) - F.length(F.conv(F.col("w"), 10, 2)) + 1
    )
    regs = (
        prepared.withColumn("rho", F.least(rho, F.lit(RHO_CAP)).cast("int"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    per_group = regs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_buckets_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - m_j AS INT))")
        ).alias("present_sum"),
    )
    scale = float(1 << RHO_CAP)
    full_sum = F.col("present_sum") + (F.lit(HLL_M) - F.col("n_buckets_hit")) * F.lit(
        1 << RHO_CAP
    ).cast("long")
    return per_group.select(
        group_col,
        "n_buckets_hit",
        full_sum.alias("register_sum"),
        F.round(
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M) * float(HLL_M))
            * F.lit(scale)
            / full_sum,
            3,
        ).alias("hll_estimate"),
    )


# --- Count-min sketch ---------------------------------------------------------

CMS_D = 3  # hash rows
CMS_W = 1024  # counters per row


def cms_build(df: DataFrame, value_col: str) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies: (j, bucket, cnt) —
    d×w integer counters. All-integer, so the sketch is exact-identical
    in any engine; the build is one partial-aggregated count keyed
    (j, bucket), shuffle rows bounded by d×w regardless of input."""
    rows = []
    for j in range(CMS_D):
        b = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(value_col).cast("string"), F.lit(f":{j}"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(CMS_W),
        )
        rows.append(F.struct(F.lit(j).alias("j"), b.alias("bucket")))
    return (
        df.select(F.explode(F.array(*rows)).alias("x"))
        .groupBy(F.col("x.j").alias("j"), F.col("x.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, values: DataFrame, value_col: str) -> DataFrame:
    """Point-estimate each value's frequency: min over the d counters its
    hashes land in (>= truth always; error bounded by n·e/w w.h.p.). The
    sketch side is d×w rows — broadcast — so estimation is a map over the
    probe values."""
    probes = []
    for j in range(CMS_D):
        b = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(value_col).cast("string"), F.lit(f":{j}"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(CMS_W),
        )
        probes.append(F.struct(F.lit(j).alias("j"), b.alias("bucket")))
    exploded = values.select(
        F.col(value_col), F.explode(F.array(*probes)).alias("x")
    ).select(value_col, F.col("x.j").alias("j"), F.col("x.bucket").alias("bucket"))
    return (
        exploded.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(value_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


def hll_registers(df: DataFrame, value_col: str, group_cols: tuple = ()) -> DataFrame:
    """``(*group_cols, bucket, m_j)`` — the HLL sketch in its mergeable
    register form. Register-wise MAX over ANY partition of the input
    equals the registers of the union (max is associative, commutative,
    idempotent), which is the property that lets shard-local sketches
    roll up to the global one without touching raw data again — the
    two-level merge `hll_distinct`'s partial aggregation already
    performs, exposed here so the parity can be PROVEN as a query."""
    h = F.expr(
        f"CAST(conv(substring(md5(CAST({value_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    prepared = df.select(
        *[F.col(c) for c in group_cols],
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.expr(
            f"CAST(conv(substring(md5(CAST({value_col} AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT) DIV {HLL_M}"
        ).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS) - F.length(F.conv(F.col("w"), 10, 2)) + 1
    )
    return (
        prepared.withColumn("rho", F.least(rho, F.lit(RHO_CAP)).cast("int"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
