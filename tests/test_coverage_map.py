"""The COVERAGE.md §2 operator map must stay consistent with the
registry: every mapped gate query exists, and regenerating the report
succeeds (a renamed query would silently orphan its operator row)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_survey_map_names_resolve():
    from coverage_report import SURVEY_S2_MAP

    from cdc_agents_data_stream_spark.queries.registry import all_queries

    qs = all_queries()
    missing = [
        op for op, (gate, kind) in SURVEY_S2_MAP.items()
        if kind == "query" and gate not in qs
    ]
    assert not missing, f"coverage map references unknown queries: {missing}"
    assert len(SURVEY_S2_MAP) == 62  # SURVEY §2's full operator count
