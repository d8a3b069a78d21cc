"""Sequence packing (dataops.packing): distributed prefix sum vs a
single-threaded brute-force packing of the same deterministic order."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from debezium_spark.dataops.packing import pack_sequences

SEQ = 128
NB = 16


def _h32(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def _brute(rows, seq_len=SEQ, n_buckets=NB):
    """Ground truth: global sort by (bucket, fraction, id), running cumsum."""
    live = [(i, t) for i, t in rows if t > 0]
    live.sort(key=lambda r: (_h32(r[0]) % n_buckets, _h32(r[0]) / 2**32, r[0]))
    out, pos = {}, 0
    for i, t in live:
        first, last = pos // seq_len, (pos + t - 1) // seq_len
        out[i] = (t, pos, first, last, last - first + 1)
        pos += t
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 300) for i in range(500)]  # includes zero-token docs
    return spark.createDataFrame(rows, "doc_id long, toks long").cache()


def test_pack_matches_bruteforce(spark, docs):
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["global_start"], r["first_seq"], r["last_seq"],
            r["n_seqs"],
        )
        for r in pack_sequences(
            docs, SEQ, "toks", n_buckets=NB
        ).collect()
    }
    want = _brute([(i, (i * 37) % 300) for i in range(500)])
    assert got == want
    # zero-token docs occupy no position and are dropped
    assert all((i * 37) % 300 > 0 for i in got)


def test_pack_is_contiguous_and_boundary_exact(spark):
    # 4 docs of exactly SEQ tokens each: every doc fills exactly one
    # sequence, none straddles
    df = spark.createDataFrame(
        [(i, SEQ) for i in range(4)], "doc_id long, toks long"
    )
    rows = pack_sequences(df, SEQ, "toks", n_buckets=4).collect()
    assert sorted(r["global_start"] for r in rows) == [0, SEQ, 2 * SEQ, 3 * SEQ]
    assert all(r["first_seq"] == r["last_seq"] and r["n_seqs"] == 1 for r in rows)
    # stream is gapless: starts + lengths tile [0, total)
    spans = sorted((r["global_start"], r["n_tokens"]) for r in rows)
    pos = 0
    for start, n in spans:
        assert start == pos
        pos += n


def test_pack_plan_has_no_global_window_on_data(spark, docs):
    plan = pack_sequences(
        docs, SEQ, "toks", n_buckets=NB
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus-side window is hash-partitioned by bucket, and the bucket
    # offsets come back via broadcast — the only SinglePartition stage is
    # the O(n_buckets) totals cumsum
    assert "hashpartitioning(_b" in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_pack_validates_args(spark, docs):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, 0, "toks")
    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(docs, SEQ, "toks", n_buckets=0)


def test_pack_sequence_ids_exact_above_2_53(spark):
    """Final review r5: first_seq/last_seq used double division, so a
    token stream past 2^53 assigned boundary docs to the wrong sequence.
    With seq_len=1 every doc must satisfy first_seq == global_start
    EXACTLY — the double path floors 2^53+1 to 2^53."""
    big = (1 << 53) + 1
    docs = spark.createDataFrame(
        [(1, big), (2, 5)], "doc_id long, n long"
    )
    out = pack_sequences(docs, seq_len=1, tokens_col="n").collect()
    for r in out:
        assert r["first_seq"] == r["global_start"], r
        assert r["last_seq"] == r["global_start"] + r["n_tokens"] - 1, r
    assert {r["global_start"] for r in out} == {0, big} or \
           {r["global_start"] for r in out} == {0, 5}
