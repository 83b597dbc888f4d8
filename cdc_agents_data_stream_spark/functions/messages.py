"""Polymorphic agent-message codec (UD4) and trigger-payload parse (S2).

The reference deserializes LangGraph agent messages through a sealed
interface with five subtypes discriminated by a JSON ``type`` field —
``ai`` / ``human`` / ``system`` / ``function`` / ``tool``
(model/BaseMessage.java:28-47) — and normalizes the ``content`` field from
*string or array of strings* to always-array
(model/BaseMessage.java:49-91, ContentValueDeserializer).

Spark-first realization: one permissive ``from_json`` over a superset
struct (unknown/extra keys are ignored, missing keys come back null — the
same leniency Jackson gives), then pure-column normalization:

- ``content``: try ``from_json(raw, array<string>)``; when that is null the
  value was a bare JSON string, so wrap the scalar extraction in
  ``array(...)``. No UDF — the dispatch stays inside whole-stage codegen.
- type dispatch needs no per-subtype schema because the subtype fields are
  a union: ``tool_calls``/``invalid_tool_calls`` only ever appear on ``ai``
  (BaseMessage.java:151-155), ``tool_call_id`` only on ``tool``; on other
  types they are simply null.

Trigger payloads (S2) are the two-field JSON the reference's Postgres
trigger builds with ``json_build_object`` and ships over NOTIFY
(subscriber/CdcAgentsPostgresSubscriber.java:29-44, parse at
subscriber/AgentPostgresService.java:20-30).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MESSAGE_TYPES = ("ai", "human", "system", "function", "tool")

# Superset struct over the five sealed subtypes (model/BaseMessage.java:146-360).
# ``content`` is kept as a raw JSON fragment (string) so the string-or-array
# normalization can happen as a column expression afterwards.
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("additional_kwargs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("response_metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("tool_calls", T.StringType()),
        T.StructField("invalid_tool_calls", T.StringType()),
        T.StructField("tool_call_id", T.StringType()),
    ]
)

TRIGGER_SCHEMA = "thread_id string, checkpoint_id string"


def normalized_content(json_col: Column) -> Column:
    """String-or-array ``content`` -> always ``array<string>``
    (ContentValueDeserializer, model/BaseMessage.java:67-91)."""
    raw = F.get_json_object(json_col, "$.content")
    as_array = F.from_json(raw, T.ArrayType(T.StringType()))
    return F.when(raw.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.coalesce(as_array, F.array(raw))
    )


def parse_message(json_col: Column) -> Column:
    """Decode one message JSON into a struct with normalized content."""
    parsed = F.from_json(json_col, MESSAGE_SCHEMA)
    return F.struct(
        parsed["type"].alias("type"),
        parsed["id"].alias("id"),
        parsed["name"].alias("name"),
        normalized_content(json_col).alias("content"),
        parsed["additional_kwargs"].alias("additional_kwargs"),
        parsed["response_metadata"].alias("response_metadata"),
        parsed["tool_calls"].alias("tool_calls"),
        parsed["invalid_tool_calls"].alias("invalid_tool_calls"),
        parsed["tool_call_id"].alias("tool_call_id"),
    )


def parse_messages(df: DataFrame, json_col: str, out_col: str = "message") -> DataFrame:
    """Column-level message decode; drop rows whose ``type`` is not one of
    the five sealed subtypes (Jackson would throw on an unknown type id —
    in a lake pipeline we quarantine instead of failing the batch)."""
    out = df.withColumn(out_col, parse_message(F.col(json_col)))
    return out.filter(F.col(f"{out_col}.type").isin(*MESSAGE_TYPES))


def message_list(json_col: Column) -> Column:
    """A checkpoint blob's ``messages``-channel payload is a JSON *list* of
    messages (channel='messages' AND type='list', dao filter F1). Explode-
    ready: returns array of raw message JSON fragments."""
    return F.from_json(json_col, T.ArrayType(T.StringType()))


def with_message_id(df: DataFrame, msg_col: str = "message", id_col: str = "msg_id") -> DataFrame:
    """C11: assign a UUID where the decoded message lacks an ``id``
    (model/BaseMessage.java:169 generates one on access). ``uuid()`` is
    JVM-side and per-row — no Python in the path."""
    return df.withColumn(
        id_col, F.coalesce(F.col(f"{msg_col}.id"), F.expr("uuid()"))
    )


def parse_trigger(json_col: Column) -> Column:
    """S2: NOTIFY payload ``{"thread_id","checkpoint_id"}`` -> struct.
    Malformed payloads parse to a null struct (the reference returns
    Optional.empty, subscriber/AgentPostgresService.java:24-29)."""
    return F.from_json(json_col, TRIGGER_SCHEMA)
