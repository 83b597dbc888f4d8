"""Repo lint: `.collect()` in ENGINE code is only legal on provably
bounded data. Every current call site is audited below with the bound
that keeps it safe at 100 TB; a new collect anywhere in the engine core
fails this test until it is audited and added with its justification.
(Query modules under queries/ are excluded: the streaming gates there
read memory-sink test harnesses by design, and the driver itself
collects gate results.)"""

from __future__ import annotations

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent / "cdc_agents_data_stream_spark"

ENGINE_DIRS = ["operators", "plans", "sources", "state", "streaming", "ctx", "functions"]

# file (relative to package) -> (expected call-site count, bound justification)
ALLOWED = {
    "operators/similarity.py": (
        7,
        "centroid/codebook materialization and PQ code tables: rows ≤ "
        "MAX_CENTROIDS / PQ codebook size (capped constants), never corpus "
        "rows; includes _assign's closure-shipped centroid table (same "
        "≤ MAX_CENTROIDS artifact, collected once per assignment build) "
        "and the round-7 collect-once sites in ivf_topk/ivfpq_topk that "
        "replace repeated centroid-subtree derivations with one bounded "
        "collect reused as a literal",
    ),
    "operators/dedup.py": (
        1,
        "bloom vocabulary words for the literal-array probe: bounded by the "
        "configured vocabulary cap, not the corpus",
    ),
    "operators/graph.py": (
        1,
        "_bucket_count: DESCRIBE EXTENDED rows for one table — catalog "
        "metadata (tens of rows), independent of graph size",
    ),
    "plans/backfill.py": (
        1,
        "small-batch driver fast path: guarded by the small_batch_max_rows "
        "threshold decided from a capped probe",
    ),
    "sources/incremental.py": (
        1,
        "single-row MAX(offset) poll bookmark",
    ),
    "state/store.py": (
        3,
        "distinct bucket ids of the touched keyset: ≤ n_buckets (64) rows",
    ),
    "streaming/ivm.py": (
        1,
        "per-micro-batch partial aggregate keyed by (window, type): bounded "
        "by the batch's distinct windows, merged driver-side into the store",
    ),
    "streaming/pipeline.py": (
        1,
        "probe capped at limit(small_batch_max_rows + 1) before deciding the "
        "distributed vs driver-side MERGE path",
    ),
}

_CALL = re.compile(r"\.collect\(\)")

# Every call site must carry a machine-checkable bound annotation: a
# `bounded:` comment on the same line or within the ANNOTATION_WINDOW
# lines above it, stating the row bound the way MAX_CENTROIDS /
# PQ_MAX_CODES sites do (e.g. "# bounded: ≤ MAX_CENTROIDS rows").
ANNOTATION_WINDOW = 6
_BOUND = re.compile(r"bounded:")


def test_engine_collect_sites_are_audited():
    found: dict[str, int] = {}
    unannotated: list[str] = []
    for d in ENGINE_DIRS:
        for f in sorted((ROOT / d).glob("**/*.py")):
            lines = f.read_text().splitlines()
            rel = str(f.relative_to(ROOT))
            n = 0
            for i, line in enumerate(lines):
                if not _CALL.search(line):
                    continue
                n += 1
                window = lines[max(0, i - ANNOTATION_WINDOW) : i + 1]
                if not any(_BOUND.search(w) for w in window):
                    unannotated.append(f"{rel}:{i + 1}")
            if n:
                found[rel] = n
    assert found == {k: v[0] for k, v in ALLOWED.items()}, (
        f"collect() call sites changed: found {found}; audit any new site "
        f"for boundedness and record it in ALLOWED with its justification"
    )
    assert not unannotated, (
        f"collect() sites missing a 'bounded:' annotation within "
        f"{ANNOTATION_WINDOW} lines: {unannotated}"
    )
