"""Generic CDC envelope apply: create/update/delete (Debezium-shaped).

The reference's CDC stream only ever inserts and updates checkpoints; a
general CDC consumer must also honor deletes. This module applies a batch
of row-level change events — ``(key, seq, op, after-image...)`` with op in
{'c','u','d'} — to the keyed state store with last-writer-wins semantics:
for each key the batch's highest-seq event decides, a delete removes the
row, anything else MERGEs its after-image.

Scale shape: the per-key resolution is one partial-aggregated ``max_by``
over the batch (batch-sized shuffle); the store work is upsert's
touched-bucket MERGE plus delete's touched-bucket anti-join — both O(batch),
never O(store). Applying time-ordered batches sequentially converges to the
same state as replaying the whole log at once (the gate query's oracle is
exactly that equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..state.store import ParquetStateStore


def resolve_last_per_key(
    envelope: DataFrame,
    key: str = "session_id",
    seq_col: str = "seq",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change batch to its final event per key (highest
    ``seq``, then ``tiebreak_col`` — pass one whenever seq can tie)."""
    order = (
        F.struct(F.col(seq_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(F.col(seq_col))
    )
    return (
        envelope.groupBy(key)
        .agg(F.max_by(F.struct(*[c for c in envelope.columns if c != key]), order).alias("_r"))
        .select(key, "_r.*")
    )


def apply_cdc_envelope(
    store: ParquetStateStore,
    envelope: DataFrame,
    key: str = "session_id",
    seq_col: str = "seq",
    op_col: str = "op",
    tiebreak_col: str | None = None,
) -> tuple[int, int]:
    """Apply one change batch; returns (n_upserted, n_deleted)."""
    final = resolve_last_per_key(envelope, key, seq_col, tiebreak_col).cache()
    try:
        ups = final.filter(F.col(op_col) != "d").drop(op_col)
        dels = final.filter(F.col(op_col) == "d").select(key)
        n_del = dels.count()
        if n_del:
            store.delete(dels, key=key)
        n_up = ups.count()
        if n_up:
            store.upsert(ups, key=key)
        return n_up, n_del
    finally:
        final.unpersist()
