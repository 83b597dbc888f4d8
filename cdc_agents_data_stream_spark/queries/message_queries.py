"""Oracle-checked queries exercising the agent-message codec (UD4) and the
trigger-payload parse (S2).

No testdata table carries real agent-message JSON, so each query first
*constructs* deterministic JSON text from ``events`` rows (pure column
expressions — both engines could build it), then runs the decode path under
test on that JSON. The oracle computes the expected post-decode values
directly, so a codec regression (type dispatch, content normalization,
malformed-payload handling) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.messages import MESSAGE_TYPES, parse_messages, parse_trigger
from .base import Q, load


def message_normalize(spark, sf_dir):
    """UD4: five-way type dispatch + string-or-array content normalization.

    Even event_ids carry ``content`` as a bare JSON string, odd ones as a
    JSON array of two strings; after the codec both shapes are
    ``array<string>`` (model/BaseMessage.java:49-91).
    """
    ev = load(spark, sf_dir, "events")
    type_col = F.element_at(
        F.array(*[F.lit(t) for t in MESSAGE_TYPES]),
        (F.col("event_id") % 5 + 1).cast("int"),
    )
    content_json = F.when(
        F.col("event_id") % 2 == 0,
        F.format_string('"evt-%d:%s"', F.col("event_id"), F.col("event_type")),
    ).otherwise(
        F.format_string('["evt-%d", "%s"]', F.col("event_id"), F.col("event_type"))
    )
    msg_json = F.format_string(
        '{"type": "%s", "name": "%s", "content": %s}',
        type_col,
        F.col("event_type"),
        content_json,
    )
    df = parse_messages(ev.withColumn("msg_json", msg_json), "msg_json")
    return df.select(
        "event_id",
        F.col("message.type").alias("msg_type"),
        F.col("message.name").alias("name"),
        F.array_join(F.col("message.content"), "|").alias("content_joined"),
        F.size(F.col("message.content")).cast("bigint").alias("n_content"),
    )


MESSAGE_NORMALIZE_SQL = """
SELECT event_id,
       CASE event_id % 5 WHEN 0 THEN 'ai' WHEN 1 THEN 'human' WHEN 2 THEN 'system'
                         WHEN 3 THEN 'function' ELSE 'tool' END AS msg_type,
       event_type AS name,
       CASE WHEN event_id % 2 = 0 THEN 'evt-' || event_id || ':' || event_type
            ELSE 'evt-' || event_id || '|' || event_type END AS content_joined,
       CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS n_content
FROM events
"""


def trigger_parse(spark, sf_dir):
    """S2: NOTIFY payload parse; malformed payloads drop out (the reference
    maps them to Optional.empty, subscriber/AgentPostgresService.java:24-29).
    Every 97th event gets a non-JSON payload to exercise that path."""
    ev = load(spark, sf_dir, "events")
    payload = F.when(F.col("event_id") % 97 == 0, F.lit("not-json")).otherwise(
        F.format_string(
            '{"thread_id": "%s", "checkpoint_id": "%s"}',
            F.col("user_id"),
            F.col("event_id"),
        )
    )
    parsed = parse_trigger(payload)
    return (
        ev.select("event_id", parsed.alias("trigger"))
        .filter(F.col("trigger.thread_id").isNotNull())
        .select(
            "event_id",
            F.col("trigger.thread_id").alias("thread_id"),
            F.col("trigger.checkpoint_id").alias("checkpoint_id"),
        )
    )


TRIGGER_PARSE_SQL = """
SELECT event_id,
       CAST(user_id AS VARCHAR) AS thread_id,
       CAST(event_id AS VARCHAR) AS checkpoint_id
FROM events
WHERE event_id % 97 <> 0
"""


QUERIES = {
    "message_normalize": Q(message_normalize, MESSAGE_NORMALIZE_SQL, "UD4 codec"),
    "trigger_parse": Q(trigger_parse, TRIGGER_PARSE_SQL, "S2 payload parse"),
}


def variant_json_extract(spark, sf_dir):
    """Spark 4 VARIANT ingestion path: ``parse_json`` the props payload
    into a VARIANT, ``variant_get`` the typed field, aggregate. VARIANT
    keeps the parsed tree in a binary form that predicate evaluation can
    navigate without re-parsing — on a 100 TB lake the parse happens
    once per row, not once per extraction. The oracle runs the plain
    JSON-operator equivalent; the integer sums must agree exactly."""
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("k_sum"),
        F.max("k").cast("long").alias("k_max"),
    )


VARIANT_JSON_EXTRACT_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY event_type
"""

QUERIES["variant_json_extract"] = Q(
    variant_json_extract,
    VARIANT_JSON_EXTRACT_SQL,
    "Spark 4 VARIANT parse/extract vs plain-JSON oracle",
)
