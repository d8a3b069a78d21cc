"""Edge semantics for the SMT/text operators flagged in the round-5 review:
outbox null routing field, language-ID tie order and the 'unknown' floor."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_outbox_null_aggregatetype_yields_null_topic(spark):
    """A null routing field must NOT silently route to the bare prefix
    topic (concat_ws skips nulls); it yields a null topic the caller can
    split off, matching the engine's quarantine-not-default pattern and
    the reference EventRouterDelegate's missing-field error."""
    from debezium_spark.operators.outbox import outbox_route

    env = spark.createDataFrame(
        [
            (1, "order", "k1", '{"v": 1}'),
            (2, None, "k2", '{"v": 2}'),
        ],
        "pos long, aggregatetype string, aggregateid string, payload string",
    ).select(
        F.lit("c").alias("op"),
        F.struct("aggregatetype", "aggregateid", "payload").alias("after"),
        F.struct(F.col("pos")).alias("source"),
    )
    out = outbox_route(env)
    rows = {r["aggregateid"]: r["topic"] for r in out.collect()}
    assert rows == {"k1": "outbox.event.order", "k2": None}


def test_language_id_tie_goes_to_earlier_language_and_zero_is_unknown(spark):
    """Review r5: the old strict-> fold resolved ties to the LAST language
    (fr) and made 'unknown' unreachable. Documented order: en > de > es >
    fr on ties; all-zero marker hits → 'unknown'."""
    from debezium_spark.dataops.text import language_id

    docs = spark.createDataFrame(
        [
            (1, "the le"),            # en/fr tie → en
            (2, "der le la und et"),  # de=2 fr=3 (la counts es+fr... see below)
            (3, "hello world"),       # zero hits everywhere → unknown
            (4, "el que y le"),       # es=3 fr=1 → es
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[3] == "unknown"
    assert got[4] == "es"
    # doc 2: de hits der+und=2, fr hits le+la+et=3 → fr outright (no tie)
    assert got[2] == "fr"


def test_skipped_operations_passes_null_op_to_quarantine(spark):
    """Final review r5: ~op.isin(skipped) is NULL for a NULL op and the
    filter dropped the row BEFORE the engine's quarantine probe — the
    'one bad row never wedges OR vanishes' invariant. NULL-op rows pass
    through the SMT and quarantine downstream as unknown_op."""
    from debezium_spark.operators.filters import skipped_operations

    env = spark.createDataFrame(
        [("c",), ("d",), (None,)], "op string"
    )
    got = {r["op"] for r in skipped_operations(env, ["d"]).collect()}
    assert got == {"c", None}


def test_table_include_matches_full_name_not_substring(spark):
    """Final review r5: unanchored rlike over-matched —
    include 'inventory.orders' also kept 'inventory.orders_audit' and
    'myinventory.orders' (and the unescaped '.' matched any char).
    Patterns now match the FULL db.table (Debezium Selectors)."""
    from debezium_spark.operators.filters import table_include

    rows = [
        (("inventory", "orders"),),
        (("inventory", "orders_audit"),),
        (("myinventory", "orders"),),
    ]
    env = spark.createDataFrame(rows, "source struct<db:string,`table`:string>")
    kept = table_include(env, include_regex=r"inventory\.orders")
    assert [r["source"]["table"] for r in kept.collect()] == ["orders"]
    # already-anchored patterns (the config path) stay equivalent
    kept2 = table_include(env, include_regex=r"^(?:inventory\.orders)$")
    assert kept2.count() == 1
    dropped = table_include(env, exclude_regex=r"inventory\.orders")
    assert {r["source"]["table"] + "@" + r["source"]["db"] for r in dropped.collect()} == \
        {"orders_audit@inventory", "orders@myinventory"}


def test_null_text_annotators_pin_to_zero_signal(spark):
    """Final review r5: F.least() SKIPS null terms, so a NULL-text doc
    scored quality 0.4 — above real short prose — and token_stats
    reported NULL counts that vanish from SUMs and fail thresholds
    bidirectionally. NULL text is the same class as empty text: every
    count 0, quality 0.0, language unknown."""
    from debezium_spark.dataops.text import language_id, quality_score, token_stats

    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[1]["quality"] == 0.0 and q[1]["n_tokens"] == 0
    assert q[1]["quality"] == q[2]["quality"]

    t = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert (t[1]["ws_tokens"], t[1]["word_tokens"], t[1]["bpe_est_tokens"]) == (0, 0, 0)

    l = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert l[1]["predicted_lang"] == "unknown" and l[1]["score_en"] == 0


def test_vocab_topk_honors_custom_id_col(spark):
    from debezium_spark.dataops.text import vocab_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha")], "my_id long, text string"
    )
    top = vocab_topk(docs, k=1, id_col="my_id").collect()
    assert [(r["term"], r["df"]) for r in top] == [("alpha", 2)]


def test_tombstone_composes_with_pk_change_split(spark):
    """Final review r5: composing with_tombstones over split_pk_changes
    gave the tombstone the same (pos, _sub) sort key as the split's
    insert, so the reference-asserted delete → tombstone → insert order
    (MySqlConnectorIT.java:1530-1546) was nondeterministic. _sub
    re-spacing slots the tombstone strictly between them; re-application
    never double-tombstones."""
    from debezium_spark.operators.apply import split_pk_changes
    from debezium_spark.operators.tombstones import with_tombstones

    payload = "struct<id:long,v:string>"
    env = spark.createDataFrame(
        [("u", (1, "a"), (2, "a"), 5, ("f", 7), None)],
        f"op string, before {payload}, after {payload}, ts_ms long, "
        "source struct<file:string,pos:long>, "
        "transaction struct<id:string,total_order:long>",
    )
    out = with_tombstones(split_pk_changes(env, ["id"]))
    rows = out.orderBy("source.pos", "_sub").collect()
    kinds = [
        "tombstone" if r["_tombstone"] else r["op"] for r in rows
    ]
    assert kinds == ["d", "tombstone", "c"], kinds
    subs = [r["_sub"] for r in rows]
    assert len(set(subs)) == 3, f"sort keys must be distinct: {subs}"

    # re-application never tombstones a tombstone: the delete row gains a
    # (redundant) second tombstone, but the tombstone row itself (op='d'
    # with the marker set) must not spawn a third
    again = with_tombstones(out)
    assert again.filter("_tombstone").count() == 2
