"""Context enrichment (UD5/S5/S6): provider fan-out, consume-once file
source, seq stamping through the state transition."""

from __future__ import annotations

import os

from cdc_agents_data_stream_spark.ctx import (
    environment_provider,
    make_environment_provider,
    make_test_report_provider,
    scan_git_repositories,
)
from cdc_agents_data_stream_spark.operators.merge import transition


def _items(ts, task="t1", content="line1\nline2"):
    return [
        {
            "task_id": task,
            "content": content,
            "timestamp": ts,
            "thread_id": "s1",
            "checkpoint_id": f"cp-{ts}",
        }
    ]


def test_test_report_provider_consume_once(tmp_path):
    runner = tmp_path / "reports"
    sess = runner / "s1" / "sub"
    sess.mkdir(parents=True)
    (sess / "r1.xml").write_text("<ok/>")
    (runner / "s1" / "r0.txt").write_text("top-level")

    provider = make_test_report_provider([str(runner)])
    item = provider({"session_id": "s1"})
    assert item["type"] == "test-report"
    # key = registrationId:fileName (TestReportContextProvider.java:105)
    assert item["testReports"] == {"s1:r1.xml": "<ok/>", "s1:r0.txt": "top-level"}
    # consume-once: children deleted, session dir kept
    assert os.listdir(runner / "s1") == []
    # second call -> empty map, still emits an item
    assert provider({"session_id": "s1"})["testReports"] == {}


def test_provider_seq_stamping_in_transition(tmp_path):
    """Ctx items get the same sequence number as the concurrently-produced
    diff (ContextService.java:40-44)."""
    runner = tmp_path / "reports"
    (runner / "s1").mkdir(parents=True)
    (runner / "s1" / "a.log").write_text("pass")
    providers = [make_test_report_provider([str(runner)]), environment_provider]

    doc, diff = transition(None, "s1", _items(1000), source="cdc", ctx_providers=providers)
    assert doc["sequence_number"] == 1
    assert diff["sequenceNumber"] == 1
    assert [c["type"] for c in doc["ctx"]] == ["test-report", "environment"]
    assert all(c["sequenceNumber"] == 1 for c in doc["ctx"])
    assert doc["ctx"][0]["testReports"] == {"s1:a.log": "pass"}

    # next tick: reports already consumed -> empty map, seq advances with diff
    doc2, diff2 = transition(doc, "s1", _items(2000, content="line1\nline2\nline3"), source="cdc", ctx_providers=providers)
    assert doc2["sequence_number"] == 2
    assert [c["sequenceNumber"] for c in doc2["ctx"]] == [1, 1, 2, 2]
    assert doc2["ctx"][2]["testReports"] == {}


def test_environment_provider_reference_parity():
    item = environment_provider({"session_id": "sX"})
    assert item["type"] == "environment"
    assert item["sessionId"] == "sX"
    assert "repositories" not in item  # scan disabled, like the reference


def test_git_scanner_finds_this_repo():
    repos = scan_git_repositories("/root/repo", max_depth=1)
    assert len(repos) == 1
    details = repos[0]
    assert details["path"] == "/root/repo"
    assert details["branch"] == "main"
    assert details["head"] and len(details["head"]) == 40
    assert len(details["recent_commits"]) >= 5

    enabled = make_environment_provider("/root/repo", max_depth=1)
    item = enabled({"session_id": "sY"})
    assert item["repositories"][0]["path"] == "/root/repo"
