"""ActivateTracingSpan SMT — per-event tracing spans, pure Catalyst.

Re-creates the semantics of the reference's tracing transform
(``debezium-core/.../transforms/tracing/ActivateTracingSpan.java``):

- tombstones and non-envelope records pass through untouched (``:118``);
- a propagated parent span context is read from the *data itself*:
  ``after.<tracing.span.context.field>`` (default ``tracingspancontext``,
  ``:27-30``), a java.util.Properties-serialized text map (one
  ``key=value`` per line — DebeziumTextMap); with
  ``tracing.with.context.field.only=true`` events without it are skipped
  (``:134-136``);
- two spans are produced (``:146-190``): a parent ``db-log-write`` span
  starting at the *database* event time ``source.ts_ms`` and tagged with
  every source field under a ``db.`` prefix, child-of the propagated
  context when present; and a child span (default name ``debezium-read``,
  ``:24``) starting at the *processing* time ``ts_ms`` and tagged with
  op + ts_ms; both tagged ``component=debezium`` (``:25``);
- the child span's context is injected into the record headers so
  downstream consumers continue the trace.

Spark mapping: tracer state is replaced by deterministic ids — the
OpenTracing library calls become columns. The trace id comes from the
propagated W3C ``traceparent`` entry when present (version-trace_id-
span_id-flags) and otherwise derives from the event offset, so replay
produces identical traces (replay-stable like every other id in this
engine). Span ids are sha2 of (trace_id, operation name, offset). Output
is the envelope plus a ``spans`` array (the two span rows: name, ids,
start micros, tags map) and the serialized ``traceparent`` context under
a ``headers`` map — one projection, whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: defaults — ActivateTracingSpan.java:22-25
DEFAULT_SPAN_CONTEXT_FIELD = "tracingspancontext"
DEFAULT_OPERATION_NAME = "debezium-read"
TX_LOG_WRITE_OPERATION_NAME = "db-log-write"
TRACING_COMPONENT = "debezium"

_SOURCE_TAG_FIELDS = ["file", "pos", "db", "table", "ts_ms"]


def _span_id(trace_id: Column, name: str, offset: Column) -> Column:
    return F.substring(
        F.sha2(F.concat_ws("|", trace_id, F.lit(name), offset), 256), 1, 16
    )


def activate_tracing_span(
    env: DataFrame,
    span_context_field: str = DEFAULT_SPAN_CONTEXT_FIELD,
    operation_name: str = DEFAULT_OPERATION_NAME,
    require_context_field: bool = False,
) -> DataFrame:
    """Envelope rows → envelope + ``spans`` + ``headers``.

    The span-context payload field is looked up as
    ``after.<span_context_field>`` when the payload declares it (absent →
    no parent context, like the reference's schema check at ``:129``).
    With ``require_context_field`` only events carrying a context are
    traced; others pass through with null spans/headers (the reference
    returns the record unmodified — same effect, stable schema).
    """
    # schema check mirrors the reference's (:129): the context rides only a
    # struct-typed `after` that declares the field — a missing `after` or a
    # non-struct one (the MongoDB document envelope's JSON string) means no
    # parent context, never an error
    from pyspark.sql.types import StructType

    after_type = env.schema["after"].dataType if "after" in env.columns else None
    has_ctx_field = isinstance(after_type, StructType) and span_context_field in [
        f.name for f in after_type.fields
    ]
    ctx_raw = (
        F.col(f"after.{span_context_field}")
        if has_ctx_field
        else F.lit(None).cast("string")
    )
    # Properties text map: one key=value per line (DebeziumTextMap).
    ctx_map = F.str_to_map(ctx_raw, F.lit("\n"), F.lit("="))
    traceparent_in = ctx_map.getItem("traceparent")

    # The offset feeds every derived id. PK-change splits emit up to three
    # records sharing one source.pos distinguished only by `_sub`
    # (operators/apply.py) — include it so those records get DISTINCT
    # trace/span identities instead of collapsing into one (review r5).
    offset_parts = [F.col("source.file"), F.col("source.pos").cast("string")]
    if "_sub" in env.columns:
        offset_parts.append(F.col("_sub").cast("string"))
    offset = F.concat_ws(":", *offset_parts)
    # trace id: propagated (field 2 of traceparent) else offset-derived.
    trace_id = F.coalesce(
        # regexp_extract yields '' on a present-but-malformed traceparent —
        # treat that like no context at all.
        F.nullif(F.regexp_extract(traceparent_in, r"^[0-9a-f]{2}-([0-9a-f]{32})-", 1), F.lit("")),
        F.substring(F.sha2(offset, 256), 1, 32),
    )
    parent_span_in = F.regexp_extract(traceparent_in, r"^[0-9a-f]{2}-[0-9a-f]{32}-([0-9a-f]{16})", 1)

    txlog_id = _span_id(trace_id, TX_LOG_WRITE_OPERATION_NAME, offset)
    read_id = _span_id(trace_id, operation_name, offset)

    src_tags = [
        (F.lit("db." + f), F.col(f"source.{f}").cast("string")) for f in _SOURCE_TAG_FIELDS
    ]
    txlog_span = F.struct(
        F.lit(TX_LOG_WRITE_OPERATION_NAME).alias("operation_name"),
        trace_id.alias("trace_id"),
        txlog_id.alias("span_id"),
        F.when(parent_span_in != "", parent_span_in).alias("parent_span_id"),
        (F.col("source.ts_ms") * 1000).alias("start_ts_micros"),
        F.create_map(
            F.lit("component"), F.lit(TRACING_COMPONENT),
            *[c for pair in src_tags for c in pair],
        ).alias("tags"),
    )
    read_span = F.struct(
        F.lit(operation_name).alias("operation_name"),
        trace_id.alias("trace_id"),
        read_id.alias("span_id"),
        txlog_id.alias("parent_span_id"),
        (F.col("ts_ms") * 1000).alias("start_ts_micros"),
        F.create_map(
            F.lit("component"), F.lit(TRACING_COMPONENT),
            F.lit("op"), F.col("op"),
            F.lit("ts_ms"), F.col("ts_ms").cast("string"),
        ).alias("tags"),
    )

    # Tombstones / non-envelope rows pass through untraced (:118); with
    # require_context_field, so do rows without a propagated context.
    # Engine tombstones carry op='d' plus the `_tombstone` marker
    # (operators/tombstones.py), so op.isNotNull() alone would trace them —
    # duplicating their delete's span ids (review r5); the marker check is
    # null-coalesced like flatten.py's.
    traced = F.col("op").isNotNull()
    if "_tombstone" in env.columns:
        traced = traced & ~F.coalesce(F.col("_tombstone"), F.lit(False))
    if require_context_field:
        # the reference checks field *presence* (:134), not validity
        traced = traced & ctx_raw.isNotNull()

    headers = F.create_map(
        F.lit("traceparent"),
        F.concat_ws("-", F.lit("00"), trace_id, read_id, F.lit("01")),
    )
    return env.withColumn(
        "spans", F.when(traced, F.array(txlog_span, read_span))
    ).withColumn("headers", F.when(traced, headers))
