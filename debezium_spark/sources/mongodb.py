"""MongoDB change-stream source — stream events → Debezium document envelope.

Re-creates the semantics of the reference's MongoDB connector
(`debezium-connector-mongodb`), which tails a change stream (the modern
replacement for the raw oplog) and emits a *document* envelope whose data
fields are JSON strings rather than typed structs:

- operationType → op: insert→c, update→u, replace→u, delete→d
  (``MongoDbChangeStreamChangeRecordEmitter.java:41-44`` OPERATION_LITERALS);
- the value carries ``after`` = full-document JSON for create/replace
  (``MongoDbCollectionSchema.java:91,112``) and for updates only when the
  stream was opened with a full-document lookup (``:118``); updates
  additionally carry ``updateDescription{updatedFields: json-string,
  removedFields: array<string>}`` (``:122-136``; field names
  ``MongoDbFieldName.java:20-24``);
- deletes carry neither image — the key alone identifies the document;
- the record key is ``id`` = the canonical JSON of the documentKey
  (``JsonSerialization.java``), NOT a typed struct: Mongo documents are
  schemaless so keys/values stay strings end-to-end;
- the source block carries replica-set ord/cluster time.

Spark-first: one Catalyst projection per event (a variant extraction pulls
the `_id` out of the documentKey JSON *as canonical JSON text* — unlike
``get_json_object``, which strips string quoting and would collapse the
distinct documents ``{_id: 1}`` and ``{_id: "1"}`` onto one key; no
per-row Python). The companion
``extract_new_document_state`` re-creates the connector's
ExtractNewDocumentState SMT (``transforms/ExtractNewDocumentState.java``):
it parses the JSON ``after`` into a *caller-declared* Spark schema via
``from_json`` — for update events without a full document it falls back to
``updateDescription.updatedFields``, yielding the partial new state the SMT
emits in that mode — plus the delete-handling modes (drop / rewrite with
``__deleted``) shared with the relational ENS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# operationType literals → envelope op (MongoDbChangeStreamChangeRecordEmitter.java:41-44)
_OP_MAP = {"insert": "c", "update": "u", "replace": "u", "delete": "d"}


def change_stream_to_envelope(
    cs: DataFrame, rs: str = "rs0", db: str = "inventory", collection: str = "docs"
) -> DataFrame:
    """Change-stream events → MongoDB-flavored envelope rows.

    ``cs`` must carry ``op_type`` (operationType literal), ``doc_key``
    (documentKey JSON string), ``full_doc`` (full-document JSON string or
    null), ``updated_fields`` (JSON string or null), ``removed_fields``
    (array<string> or null), ``ord`` (long, per-stream order = resume-token
    rank), ``ts_ms`` (long cluster time). Events whose operationType has no
    envelope mapping (drop/rename/invalidate control events) pass through
    with op=null for the quarantine path — the reference filters them via
    ``isValidOperation`` (``MongoDbChangeStreamChangeRecordEmitter.java:93``).
    """
    op = F.lit(None).cast("string")
    for lit, code in _OP_MAP.items():
        op = F.when(F.col("op_type") == lit, code).otherwise(op)

    is_update = F.col("op_type").isin("update")
    has_after = F.col("op_type").isin("insert", "replace") | (
        is_update & F.col("full_doc").isNotNull()
    )

    # Canonical-JSON key (JsonSerialization.java): the id keeps its JSON
    # type — number 1 → `1`, string "1" → `"1"` — so distinct _id values of
    # different BSON types never collide. try_* keeps malformed/absent
    # documentKey JSON a null id (quarantine material), not an error.
    doc_id = F.to_json(
        F.try_variant_get(F.try_parse_json(F.col("doc_key")), "$._id", "variant")
    )
    return cs.select(
        doc_id.alias("id"),
        F.when(has_after, F.col("full_doc")).alias("after"),
        F.when(
            is_update,
            F.struct(
                F.col("updated_fields").alias("updatedFields"),
                F.col("removed_fields").alias("removedFields"),
            ),
        ).alias("updateDescription"),
        op.alias("op"),
        F.col("ts_ms"),
        F.struct(
            F.lit(rs).alias("file"),
            F.col("ord").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit(db).alias("db"),
            F.lit(collection).alias("table"),
            F.col("ts_ms").alias("ts_ms"),
        ).alias("source"),
        # envelope-contract transaction block (null: change streams carry
        # txnNumber only inside multi-doc transactions, out of scope here)
        F.lit(None)
        .cast("struct<id:string,total_order:bigint,data_collection_order:bigint>")
        .alias("transaction"),
    )


def extract_new_document_state(
    env: DataFrame,
    doc_schema_ddl: str,
    delete_handling: str = "rewrite",
) -> DataFrame:
    """ExtractNewDocumentState: document envelope → flat typed row.

    Parses ``after`` (falling back to ``updateDescription.updatedFields``
    for partial updates — the SMT's behavior when no full-document lookup
    was configured) into ``doc_schema_ddl`` via ``from_json``; fields
    absent from the JSON come out null. ``delete_handling``: ``drop``
    removes delete events, ``rewrite`` keeps them with ``__deleted=true``
    and a null document, ``none`` keeps them untouched — mirroring the
    relational ENS modes (``transforms/ExtractNewDocumentState.java``).
    """
    if delete_handling not in ("drop", "rewrite", "none"):
        raise ValueError(f"unknown delete_handling {delete_handling!r}")
    if delete_handling == "drop":
        # null-safe: op=null control events must survive to the quarantine
        # path in every mode (a plain != would three-value them away here)
        env = env.filter(~F.col("op").eqNullSafe("d"))

    doc_json = F.coalesce(F.col("after"), F.col("updateDescription.updatedFields"))
    out = env.select(
        F.col("id"),
        F.col("op"),
        F.col("ts_ms"),
        F.col("source"),
        F.from_json(doc_json, doc_schema_ddl).alias("doc"),
    )
    if delete_handling == "rewrite":
        # string 'true'/'false' to match the relational ENS rewrite
        # (operators/flatten.py — the SMT emits a STRING field); null-safe
        # so control rows read 'false', not null
        out = out.withColumn("__deleted", F.col("op").eqNullSafe("d").cast("string"))
    return out.select(
        "id", "op", "ts_ms", "source", "doc.*",
        *(["__deleted"] if delete_handling == "rewrite" else []),
    )
