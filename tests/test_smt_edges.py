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
