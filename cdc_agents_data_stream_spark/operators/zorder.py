"""Z-order (Morton) clustering for multi-column data skipping.

Parquet row-group pruning works off per-file min/max statistics — but
sorting a lake table by ONE column destroys locality on every other
column. Interleaving the bits of several columns into one Morton key and
range-partitioning + sorting by that key gives every interleaved column
narrow per-file ranges, so predicates on ANY of them prune files. This is
the standard lake-layout optimization (Delta/Iceberg `OPTIMIZE ZORDER
BY`) re-expressed as plain DataFrame ops: one codegen expression for the
key, one range exchange for the layout — nothing driver-side, no UDF.

The key expression is pure integer bit arithmetic (shifts/masks summed
over a literal-unrolled bit range), identical in Spark SQL and DuckDB —
the oracle runs the same generated formula, making the gate engine-exact.
Callers pre-normalize each column onto a ``[0, 2^bits)`` integer grid
(rank- or min/max-scaling, their choice — normalization is a separate,
ordinary projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_expr_sql(cols: list[str], bits: int) -> str:
    """The shared Morton-interleave formula: bit b of column c lands at
    position ``b * n_cols + c``. Literal-unrolled so both engines fold it
    into codegen; valid Spark SQL and DuckDB SQL verbatim."""
    n = len(cols)
    terms = []
    for c_idx, c in enumerate(cols):
        for b in range(bits):
            shift = b * n + c_idx
            terms.append(f"((({c} >> {b}) & 1) << {shift})")
    return " + ".join(terms)


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 10, key_col: str = "zval"
) -> DataFrame:
    """Append the Morton key over pre-normalized integer columns."""
    return df.withColumn(key_col, F.expr(zorder_expr_sql(cols, bits)).cast("long"))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_files: int = 8,
    key_col: str = "zval",
) -> DataFrame:
    """Cluster ``df`` for data skipping: range-partition on the Morton key
    (one exchange — same cost as any repartition) and sort within
    partitions so row-group stats are tight. Write the result with
    ``.write.parquet`` and every interleaved column prunes."""
    keyed = with_zorder_key(df, cols, bits, key_col)
    return keyed.repartitionByRange(num_files, F.col(key_col)).sortWithinPartitions(
        key_col
    )
