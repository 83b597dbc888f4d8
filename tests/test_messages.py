"""UD4 message codec + S2 trigger parse unit tests (round-trip semantics of
model/BaseMessage.java:28-91 and subscriber/AgentPostgresService.java:20-30)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc_agents_data_stream_spark.functions.messages import (
    message_list,
    parse_messages,
    parse_trigger,
)


def _decode(spark, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "msg string")
    return parse_messages(df, "msg").select("message.*").collect()


def test_five_type_dispatch(spark):
    rows = _decode(
        spark,
        [
            json.dumps({"type": t, "content": f"hello-{t}", "id": f"id-{t}"})
            for t in ("ai", "human", "system", "function", "tool")
        ],
    )
    assert sorted(r["type"] for r in rows) == ["ai", "function", "human", "system", "tool"]
    for r in rows:
        assert r["content"] == [f"hello-{r['type']}"]  # string -> [string]
        assert r["id"] == f"id-{r['type']}"


def test_content_array_passthrough_and_fields(spark):
    msg = {
        "type": "ai",
        "content": ["line a", "line b"],
        "name": "assistant",
        "additional_kwargs": {"k": "v"},
        "response_metadata": {"model": "m"},
    }
    (row,) = _decode(spark, [json.dumps(msg)])
    assert row["content"] == ["line a", "line b"]  # array stays array
    assert row["name"] == "assistant"
    assert row["additional_kwargs"] == {"k": "v"}
    assert row["response_metadata"] == {"model": "m"}


def test_unknown_type_quarantined(spark):
    rows = _decode(
        spark,
        [json.dumps({"type": "alien", "content": "x"}), json.dumps({"type": "human", "content": "y"})],
    )
    assert [r["type"] for r in rows] == ["human"]


def test_missing_content_is_null_not_empty_array(spark):
    (row,) = _decode(spark, [json.dumps({"type": "system"})])
    assert row["content"] is None


def test_message_list_explode(spark):
    blob = json.dumps(
        [{"type": "human", "content": "q"}, {"type": "ai", "content": ["a1", "a2"]}]
    )
    df = spark.createDataFrame([(blob,)], "blob string")
    exploded = df.select(F.explode(message_list(F.col("blob"))).alias("msg"))
    rows = parse_messages(exploded, "msg").select("message.*").collect()
    assert {r["type"] for r in rows} == {"ai", "human"}
    contents = {r["type"]: r["content"] for r in rows}
    assert contents["human"] == ["q"]
    assert contents["ai"] == ["a1", "a2"]


def test_trigger_parse_and_malformed(spark):
    df = spark.createDataFrame(
        [('{"thread_id": "t1", "checkpoint_id": "c1"}',), ("not-json",), (None,)],
        "payload string",
    )
    rows = (
        df.select(parse_trigger(F.col("payload")).alias("t"))
        .filter(F.col("t.thread_id").isNotNull())
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["t"]["thread_id"] == "t1"
    assert rows[0]["t"]["checkpoint_id"] == "c1"
