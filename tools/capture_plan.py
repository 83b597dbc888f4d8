#!/usr/bin/env python3
"""Capture a declared query's physical plan (`.explain("formatted")`) to a
file — the plan artifact format the judge checks under plans/rXX/.

Usage:
    python3 tools/capture_plan.py QUERY OUT_PATH [SF_DIR]

SF_DIR defaults to /root/testdata/sf0.1 (the bench decade, so plan shapes
match the bench). Runs from any checkout: resolves the repo root from this
file's location, so a scratch worktree of an older commit captures that
commit's plan.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cdc_agents_data_stream_spark.queries.registry import all_queries  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    query, out_path = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark()
    df = all_queries()[query].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(out_path, "w") as f:
        f.write(plan)
    print(f"{query}: {len(plan.splitlines())} plan lines -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
