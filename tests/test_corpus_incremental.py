"""Incremental corpus maintenance (CDC delta → standing corpus): the
operator's per-batch decisions must equal a single-threaded sequential
simulator applying the same first-arrival-wins rules, the census must
stay the exact digest image of the corpus, and quality-gate / PK-change /
null-text edges must route to upsert-vs-delete correctly."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.dataops.pipeline import (
    CorpusDelta,
    apply_corpus_delta,
    corpus_census,
    incremental_corpus_update,
    seed_census,
)

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
ENV_SCHEMA = T.StructType(
    [
        T.StructField("before", PAYLOAD),
        T.StructField("after", PAYLOAD),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("file", T.StringType()),
                    T.StructField("pos", T.LongType()),
                    T.StructField("snapshot", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "transaction",
            T.StructType([T.StructField("id", T.StringType())]),
        ),
    ]
)


def _delta(spark, events):
    """events: (pos, op, before_id, before_text, after_id, after_text)."""
    rows = []
    for pos, op, bid, btext, aid, atext in events:
        before = (bid, btext) if op != "c" else None
        after = (aid, atext) if op != "d" else None
        rows.append((before, after, op, pos, ("b1", pos, None), ("tx",)))
    return spark.createDataFrame(rows, ENV_SCHEMA)


def _sha(text):
    return hashlib.sha256(text.encode()).hexdigest() if text is not None else None


def _simulate(state: dict, batches, min_chars: int = 1) -> dict:
    """Sequential single-threaded oracle (no Spark): per batch, last event
    per id wins, candidates pass min_chars, exact dedup is first-arrival-
    wins against the standing corpus minus this batch's touched ids, with
    min-id election inside the batch."""
    for events in batches:
        final = {}
        for pos, op, bid, btext, aid, atext in sorted(events):
            if op == "u" and bid != aid:  # PK change = delete(old)+create(new)
                final[bid] = ("d", None)
                final[aid] = ("u", atext)
            elif op == "d":
                final[bid] = ("d", None)
            else:
                final[aid] = ("u", atext)
        touched = set(final)
        cands = {
            i: t
            for i, (op, t) in final.items()
            if op == "u" and (len(t) if t is not None else 0) >= min_chars
        }
        rest = {}
        for i, t in state.items():
            if i in touched:
                continue
            d = _sha(t)
            rest[d] = min(rest.get(d, i), i)
        admitted = {}
        for i, t in cands.items():
            d = _sha(t)
            if d in rest:
                continue
            if min(j for j, u in cands.items() if _sha(u) == d) == i:
                admitted[i] = t
        for i in touched:
            if i in state and i not in admitted:
                del state[i]
        state.update(admitted)
    return state


def _corpus_df(spark, state: dict):
    return spark.createDataFrame(
        [(i, t) for i, t in sorted(state.items())],
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        ),
    )


def _apply(corpus: dict, d: CorpusDelta) -> dict:
    """Apply the emitted mutation to a dict corpus (the MERGE a lake
    table would run)."""
    ups = {r["doc_id"]: r["text"] for r in d.upserts.collect()}
    dels = {r["doc_id"] for r in d.deletes.collect()}
    assert not (dels & set(ups)), "a doc must not be both upserted and deleted"
    for i in dels:
        del corpus[i]  # deletes must name docs that exist
    corpus.update(ups)
    return corpus


BATCHES = [
    # batch 1: creates — fresh, intra-batch dup pair (11/12 share text,
    # min id 11 wins), one duplicating standing corpus doc 1
    [
        (100, "c", None, None, 10, "fresh ten"),
        (101, "c", None, None, 12, "twin text"),
        (102, "c", None, None, 11, "twin text"),
        (103, "c", None, None, 13, "alpha"),  # doc 1's content
    ],
    # batch 2: delete a survivor, update-to-duplicate, update-to-fresh,
    # same id touched twice (last wins), delete-and-replace content in
    # one batch (3's old content leaves the census, so 14 IS admitted)
    [
        (200, "d", 10, "fresh ten", None, None),
        (201, "u", 2, "beta", 2, "gamma"),  # duplicates standing doc 3
        (202, "u", 11, "twin text", 11, "draft"),
        (203, "u", 11, "draft", 11, "twin rewrite"),
        (204, "d", 3, "gamma", None, None),
        (205, "c", None, None, 14, "gamma"),
    ],
    # batch 3: re-arrival of deleted content is re-admitted; update back
    # to content whose survivor died earlier
    [
        (300, "c", None, None, 15, "fresh ten"),
        (301, "u", 14, "gamma", 14, "beta"),
    ],
]


def test_incremental_matches_sequential_simulator(spark):
    corpus = {1: "alpha", 2: "beta", 3: "gamma"}
    sim = _simulate(dict(corpus), BATCHES)

    census = corpus_census(_corpus_df(spark, corpus))
    got = dict(corpus)
    for events in BATCHES:
        d = incremental_corpus_update(_delta(spark, events), census)
        got = _apply(got, d)
        # persist-and-reload the census between batches, as production
        # would (it is a lake table, not a lineage chain)
        census = spark.createDataFrame(
            d.census.collect(), schema=d.census.schema
        )
    assert got == sim
    # census is the exact digest image of the final corpus
    census_rows = {(r["content_sha"], r["doc_id"]) for r in census.collect()}
    assert census_rows == {(_sha(t), i) for i, t in got.items()}


def test_upsert_delete_routing_single_batch(spark):
    corpus = {1: "alpha", 2: "beta", 3: "gamma"}
    census = corpus_census(_corpus_df(spark, corpus))
    events = [
        (10, "d", 1, "alpha", None, None),  # plain delete
        (11, "u", 2, "beta", 2, "gamma"),  # now duplicates doc 3 → delete
        (12, "c", None, None, 7, "alpha"),  # dup of doc 1 — but 1 leaves this batch → admit
        (13, "c", None, None, 8, "gamma"),  # dup of standing doc 3 → dropped silently
    ]
    d = incremental_corpus_update(_delta(spark, events), census)
    assert {r["doc_id"] for r in d.deletes.collect()} == {1, 2}
    assert {r["doc_id"]: r["text"] for r in d.upserts.collect()} == {7: "alpha"}


def test_pk_change_update_moves_the_doc(spark):
    corpus = {1: "alpha", 2: "beta"}
    census = corpus_census(_corpus_df(spark, corpus))
    events = [(10, "u", 1, "alpha", 9, "alpha prime")]
    d = incremental_corpus_update(_delta(spark, events), census)
    assert {r["doc_id"] for r in d.deletes.collect()} == {1}
    assert {r["doc_id"]: r["text"] for r in d.upserts.collect()} == {9: "alpha prime"}
    assert {r["doc_id"] for r in d.census.collect()} == {2, 9}


def test_quality_gate_failure_deletes_standing_doc(spark):
    long_text = "the words be to of and that have with more body " * 10
    corpus = {1: long_text, 2: long_text + "tail variant"}
    census = corpus_census(_corpus_df(spark, corpus))
    events = [
        (10, "u", 1, long_text, 1, "now too short"),  # fails word_count
        (11, "c", None, None, 5, "also short"),  # never admitted, no delete
    ]
    d = incremental_corpus_update(
        _delta(spark, events), census, gopher=True, gopher_opts={"min_words": 20}
    )
    assert {r["doc_id"] for r in d.deletes.collect()} == {1}
    assert d.upserts.count() == 0
    assert {r["doc_id"] for r in d.census.collect()} == {2}


def test_annotations_and_passthrough_columns(spark):
    payload = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source_site", T.StringType()),
        ]
    )
    schema = T.StructType(
        [T.StructField("before", payload), T.StructField("after", payload)]
        + list(ENV_SCHEMA.fields[2:])
    )
    rows = [(None, (21, "the quick brown fox jumps over it.", "siteA"), "c", 10,
             ("b1", 10, None), ("tx",))]
    d = incremental_corpus_update(
        spark.createDataFrame(rows, schema),
        corpus_census(_corpus_df(spark, {})),
        annotate=True,
    )
    row = d.upserts.collect()[0]
    assert row["source_site"] == "siteA"
    for col in ("predicted_lang", "quality", "bpe_est_tokens"):
        assert col in d.upserts.columns and row[col] is not None


def test_null_text_docs_share_one_digest_group(spark):
    corpus = {1: "alpha"}
    census = corpus_census(_corpus_df(spark, corpus))
    events = [
        (10, "c", None, None, 5, None),
        (11, "c", None, None, 6, None),
    ]
    # min_chars=1 drops null-text docs entirely
    d1 = incremental_corpus_update(_delta(spark, events), census)
    assert d1.upserts.count() == 0 and d1.deletes.count() == 0
    # min_chars=0 admits them as ONE digest group (null-safe join): min id wins
    d0 = incremental_corpus_update(_delta(spark, events), census, min_chars=0)
    assert {r["doc_id"] for r in d0.upserts.collect()} == {5}


def test_streaming_corpus_sync_matches_batch_application(spark, tmp_path):
    """The bridge under Structured Streaming: tail the delta batch dirs
    with availableNow + maxFilesPerTrigger=1 (one delta per epoch, the
    stream_replay pattern) and maintain corpus+census as versioned
    parquet inside foreachBatch. The drained final state must equal the
    per-batch batch-mode application (and hence the sequential
    simulator, already asserted above)."""
    import time

    root = str(tmp_path)
    stream_dir = f"{root}/stream"
    for i, events in enumerate(BATCHES):
        _delta(spark, events).repartition(1).write.parquet(
            f"{stream_dir}/batch_{i:05d}"
        )
        time.sleep(1.1)  # distinct mtime seconds → deterministic file order

    corpus0 = {1: "alpha", 2: "beta", 3: "gamma"}
    _corpus_df(spark, corpus0).write.parquet(f"{root}/corpus_v0")
    corpus_census(spark.read.parquet(f"{root}/corpus_v0")).write.parquet(
        f"{root}/census_v0"
    )
    state = {"v": 0}

    def apply_batch(df, epoch_id):
        v = state["v"]
        d = incremental_corpus_update(df, spark.read.parquet(f"{root}/census_v{v}"))
        cur = spark.read.parquet(f"{root}/corpus_v{v}")
        touched = d.deletes.unionByName(d.upserts.select("doc_id"))
        cur.join(touched, "doc_id", "left_anti").unionByName(
            d.upserts.select("doc_id", "text")
        ).write.parquet(f"{root}/corpus_v{v + 1}")
        d.census.write.parquet(f"{root}/census_v{v + 1}")
        state["v"] = v + 1

    q = (
        spark.readStream.schema(ENV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stream_dir}/batch_*")
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert state["v"] == len(BATCHES), "one epoch per delta batch expected"

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{root}/corpus_v{state['v']}").collect()
    }
    assert got == _simulate(dict(corpus0), BATCHES)
    census_rows = {
        (r["content_sha"], r["doc_id"])
        for r in spark.read.parquet(f"{root}/census_v{state['v']}").collect()
    }
    assert census_rows == {(_sha(t), i) for i, t in got.items()}


def test_corpus_as_laketable_with_fenced_merge(spark, tmp_path):
    """The production shape: corpus AND census are LakeTables keyed by
    doc_id, each CorpusDelta commits through the engine's fenced MERGE
    (apply_corpus_delta). Final lake state must equal the simulator, a
    replayed batch must no-op on the fence, and the census table must be
    the exact digest image of the corpus table."""
    from debezium_spark import LakeTable

    root = str(tmp_path)
    corpus_t = LakeTable(spark, f"{root}/corpus", ["doc_id"], n_buckets=4)
    corpus_t.create(
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        )
    )
    census_t = LakeTable(spark, f"{root}/census", ["doc_id"], n_buckets=4)
    census_t.create(
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content_sha", T.StringType()),
            ]
        )
    )

    seed = [
        (1, "c", None, None, 1, "alpha"),
        (2, "c", None, None, 2, "beta"),
        (3, "c", None, None, 3, "gamma"),
    ]
    batches = [seed] + BATCHES
    d = fence = None
    for i, events in enumerate(batches):
        census_df = census_t.read().select("content_sha", "doc_id")
        d = incremental_corpus_update(_delta(spark, events), census_df)
        fence = ("b1", max(e[0] for e in events))
        v1, v2 = apply_corpus_delta(corpus_t, census_t, d, fence, f"b{i:03d}")
        assert v1 is not None and v2 is not None

    got = {r["doc_id"]: r["text"] for r in corpus_t.read().collect()}
    assert got == _simulate({}, batches)
    census_rows = {
        (r["content_sha"], r["doc_id"]) for r in census_t.read().collect()
    }
    assert census_rows == {(_sha(t), i) for i, t in got.items()}

    # exactly-once: replaying the last batch's delta no-ops on both fences
    assert apply_corpus_delta(corpus_t, census_t, d, fence, "replay") == (None, None)
    assert {r["doc_id"]: r["text"] for r in corpus_t.read().collect()} == got


def test_seed_census_over_engine_bootstrapped_corpus(spark, tmp_path):
    """The pre-existing-corpus flow (review r5 finding): the corpus
    LakeTable is populated through the CDC ENGINE (whose MoR rows carry
    ENCODED resolution positions, pos*2), the census is seeded once with
    seed_census, and a later delta must (a) drop a duplicate of a
    standing doc the delta path never wrote, and (b) make its update
    visible on read even though its raw fence pos is numerically below
    the seed rows' encoded positions."""
    from debezium_spark import CdcEngine, LakeTable

    root = str(tmp_path)
    corpus_t = LakeTable(spark, f"{root}/corpus", ["doc_id"], n_buckets=4)
    corpus_t.create(
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        )
    )
    census_t = LakeTable(spark, f"{root}/census", ["doc_id"], n_buckets=4)
    census_t.create(
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content_sha", T.StringType()),
            ]
        )
    )
    seed_env = _delta(
        spark,
        [
            (598, "c", None, None, 1, "alpha"),
            (599, "c", None, None, 2, "beta"),
            (600, "c", None, None, 3, "gamma"),
        ],
    )
    CdcEngine(spark, corpus_t).apply_envelope_batch(seed_env, batch_id="seed")
    assert seed_census(census_t, corpus_t.read(), ("b1", 600)) is not None

    # fence pos 1000 < the seed rows' encoded _pos (2*598..2*600)
    ev = [
        (999, "c", None, None, 9, "gamma"),  # dup of standing doc 3 → dropped
        (1000, "u", 2, "beta", 2, "beta v2"),
    ]
    d = incremental_corpus_update(
        _delta(spark, ev), census_t.read().select("content_sha", "doc_id")
    )
    apply_corpus_delta(corpus_t, census_t, d, ("b1", 1000), "b1")
    got = {r["doc_id"]: r["text"] for r in corpus_t.read().collect()}
    assert got == {1: "alpha", 2: "beta v2", 3: "gamma"}
    census_rows = {
        (r["content_sha"], r["doc_id"]) for r in census_t.read().collect()
    }
    assert census_rows == {(_sha(t), i) for i, t in got.items()}
    # re-seeding behind the fence is a no-op
    assert seed_census(census_t, corpus_t.read(), ("b1", 600)) is None


def test_admission_is_batch_atomic_by_convention(spark):
    """Pin the documented convention: admission judges candidates against
    the batch-END standing set, so a delete + duplicate-create landing in
    ONE batch admits the newcomer, while the same events split across two
    batches suppress it first (first-arrival-wins, never stored) and only
    then delete the survivor. Cross-key dedup has no chunking-invariant
    collapse; this test is the documentation of that boundary."""
    one = [
        (10, "c", None, None, 2, "alpha"),  # arrives BEFORE the delete
        (11, "d", 1, "alpha", None, None),
    ]
    census = corpus_census(_corpus_df(spark, {1: "alpha"}))
    d = incremental_corpus_update(_delta(spark, one), census)
    assert {r["doc_id"] for r in d.upserts.collect()} == {2}
    assert {r["doc_id"] for r in d.deletes.collect()} == {1}

    census = corpus_census(_corpus_df(spark, {1: "alpha"}))
    d1 = incremental_corpus_update(_delta(spark, [one[0]]), census)
    assert d1.upserts.count() == 0  # suppressed by the still-standing doc 1
    d2 = incremental_corpus_update(
        _delta(spark, [one[1]]),
        spark.createDataFrame(d1.census.collect(), schema=d1.census.schema),
    )
    assert {r["doc_id"] for r in d2.deletes.collect()} == {1}
    assert d2.census.count() == 0  # the content is gone entirely


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_batches_match_simulator(spark, seed):
    import random

    rng = random.Random(seed)
    corpus = {i: f"seed text {i % 6}" for i in range(8)}  # standing dups exist
    pos = 1000
    batches = []
    ids = list(range(20))
    for _ in range(4):
        events = []
        for _ in range(12):
            pos += 1
            i = rng.choice(ids)
            kind = rng.random()
            if kind < 0.25:
                events.append((pos, "d", i, None, None, None))
            else:
                t = f"seed text {rng.randrange(8)}"
                events.append((pos, "u" if kind < 0.6 else "c", i, None, i, t))
        batches.append(events)
    # the simulator treats c and u identically (last state wins), as the
    # engine's compute_changes does
    sim = _simulate(dict(corpus), batches)

    census = corpus_census(_corpus_df(spark, corpus))
    got = dict(corpus)
    for events in batches:
        env = [
            (p, op, (bid if op != "c" else None), None, aid, at)
            for p, op, bid, bt, aid, at in events
        ]
        d = incremental_corpus_update(_delta(spark, env), census)
        got = _apply(got, d)
        census = spark.createDataFrame(d.census.collect(), schema=d.census.schema)
    assert got == sim
