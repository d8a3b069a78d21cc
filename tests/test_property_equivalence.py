"""Property-based equivalence: for ANY interleaving of creates/updates/
deletes/PK-renames over a small key space, the engine's parallel batched
apply must equal single-threaded sequential apply (the FIXTURES.md F6
ground truth). Hypothesis drives the op sequences; the spark session is
expensive, so examples are few but adversarial (tight key space maximizes
per-key collision/ordering pressure)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from debezium_spark import CdcEngine, LakeTable
from debezium_spark.schema import envelope_schema
from tests.conftest import sequential_oracle

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "b"), ("r1", "c")]

ops = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d", "pk"]),
        st.integers(min_value=0, max_value=len(KEYS) - 1),
        st.integers(min_value=0, max_value=len(KEYS) - 1),  # rename target
    ),
    min_size=1,
    max_size=60,
)


def _events(op_list):
    """Op tuples → envelope dicts with dense pos, tracking per-key liveness
    so the sequence is referentially valid (update/delete only live keys)."""
    live: dict[tuple, dict] = {}
    out = []
    pos = 0
    for kind, ki, kj in op_list:
        key = KEYS[ki]
        payload = {"repo": key[0], "path": key[1], "content": f"v{pos}"}
        if kind == "c":
            if key in live:
                kind = "u"
        if kind in ("u", "d", "pk") and key not in live:
            kind = "c"
        if kind == "pk":
            new_key = KEYS[kj]
            if new_key == key or new_key in live:
                kind = "u"
        before, after, op = None, None, kind
        if kind == "c":
            after = payload
            live[key] = payload
        elif kind == "u":
            before = live[key]
            after = payload
            live[key] = payload
        elif kind == "d":
            before = live.pop(key)
            after = None
        elif kind == "pk":
            new_key = KEYS[kj]
            before = live.pop(key)
            after = {"repo": new_key[0], "path": new_key[1], "content": f"v{pos}"}
            live[new_key] = after
            op = "u"
        out.append(
            {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": pos,
                "source": {
                    "file": "binlog.000001", "pos": pos, "gtid": None,
                    "snapshot": None, "db": "app", "table": "t", "ts_ms": pos,
                },
                "transaction": None,
            }
        )
        pos += 1
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(op_list=ops, n_batches=st.integers(min_value=1, max_value=4))
def test_engine_equals_sequential_apply(spark, tmp_path_factory, mode, op_list, n_batches):
    events = _events(op_list)
    from pyspark.sql.types import StructType

    payload = StructType.fromDDL("repo string, path string, content string")
    env = spark.createDataFrame(events, envelope_schema(payload))

    tmp = tmp_path_factory.mktemp("prop")
    table = LakeTable(spark, str(tmp / "t"), ["repo", "path"], n_buckets=2, mode=mode)
    table.create(payload)
    engine = CdcEngine(spark, table, compact_depth=2)

    n = len(events)
    step = max(1, (n + n_batches - 1) // n_batches)
    for b in range(0, n, step):
        batch = env.filter(
            (F.col("source.pos") >= b) & (F.col("source.pos") < b + step)
        )
        engine.apply_envelope_batch(batch, batch_id=f"b{b}")

    got = {
        (r["repo"], r["path"]): r["content"]
        for r in table.read().collect()
    }
    want = {
        k: v["content"] for k, v in sequential_oracle(events).items()
    }
    assert got == want


# ---- decontaminate vs brute-force set semantics ------------------------------

import re as _re

_WORDS = ["aa", "bb", "cc", "dd"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join)


def _shingle_set(text: str, k: int) -> set:
    toks = _re.findall(r"[a-z0-9]+", text.lower())
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    train=st.lists(_doc, min_size=1, max_size=4),
    bench=st.lists(_doc, min_size=1, max_size=3),
    k=st.integers(min_value=1, max_value=3),
)
def test_decontaminate_equals_bruteforce_set_semantics(spark, train, bench, k):
    """For ANY corpus/benchmark pair over a tiny alphabet, decontaminate
    must equal the brute-force definition: hits = |S_doc ∩ ∪ S_bench|,
    bench_docs = #{b : S_doc ∩ S_b ≠ ∅}, rows only where hits ≥ 1 —
    including the short-doc (one shorter shingle) and zero-token edges of
    the shared shingle builder."""
    from debezium_spark.dataops.dedup import decontaminate

    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["hits"], r["bench_docs"])
        for r in decontaminate(tdf, bdf, k=k).collect()
    }
    bench_sets = {100 + i: _shingle_set(t, k) for i, t in enumerate(bench)}
    bench_union = set().union(*bench_sets.values())
    want = {}
    for i, t in enumerate(train):
        s = _shingle_set(t, k)
        hits = len(s & bench_union)
        if hits >= 1:
            want[i] = (hits, sum(1 for bs in bench_sets.values() if s & bs))
    assert got == want


_LINE_POOL = ["alpha", " alpha ", "\talpha", "beta", "", "  ", "gamma delta", "x"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_LINE_POOL), min_size=0, max_size=6),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc_lines=docs_strategy, min_docs=st.integers(min_value=2, max_value=3))
def test_line_dedup_equals_bruteforce(spark, doc_lines, min_docs):
    """For ANY corpus over a tiny line pool (including blank and
    whitespace-only lines and trim-variant duplicates), line_dedup must
    equal the brute-force definition: a line is dropped iff its TRIMMED
    non-empty form appears in >= min_docs DISTINCT docs; survivors keep
    original order; every doc returns exactly once. Trim is SPACE-only
    (the Spark/ANSI trim semantic — a tab-prefixed line is a distinct
    form, pinned by the pool's tab variant)."""
    from debezium_spark.dataops.text import line_dedup

    texts = ["\n".join(ls) for ls in doc_lines]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in line_dedup(df, min_docs=min_docs).collect()
    }
    census: dict[str, set] = {}
    for i, t in enumerate(texts):
        for ln in t.split("\n"):
            if ln.strip(" "):
                census.setdefault(ln.strip(" "), set()).add(i)
    boiler = {k for k, v in census.items() if len(v) >= min_docs}
    want = {}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if not (ln.strip(" ") and ln.strip(" ") in boiler)]
        want[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    assert got == want


# ----------------------------------------------- exact substring dedup


def _brute_exact_substring(texts, k):
    counts: dict[str, int] = {}
    first: dict[str, tuple] = {}
    for i, t in enumerate(texts):
        t = t or ""
        for p in range(len(t) - k + 1):
            w = t[p : p + k]
            counts[w] = counts.get(w, 0) + 1
            first.setdefault(w, (i, p))
    out = {}
    for i, t in enumerate(texts):
        t = t or ""
        spans: list[list[int]] = []
        for p in range(len(t) - k + 1):
            w = t[p : p + k]
            if counts[w] > 1 and first[w] != (i, p):
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = p + k
                else:
                    spans.append([p, p + k])
        clean, c = [], 0
        for s, e in spans:
            clean.append(t[c:s])
            c = e
        clean.append(t[c:])
        out[i] = ("".join(clean), sum(e - s for s, e in spans), len(spans))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=24), min_size=1, max_size=6
    ),
    k=st.integers(min_value=2, max_value=5),
)
def test_exact_substring_dedup_equals_bruteforce(spark, texts, k):
    """For ANY corpus over a 2-letter alphabet (maximal window-collision
    pressure: heavy self-overlap, cross-doc chains, whole-doc erasure),
    exact_substring_dedup must equal the brute-force definition: flag
    every non-first occurrence of a >1-count window, merge overlapping
    or adjacent flags into spans, excise, count."""
    from debezium_spark.dataops.dedup import exact_substring_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_chars_removed"], r["n_dup_spans"])
        for r in exact_substring_dedup(df, k=k).collect()
    }
    assert got == _brute_exact_substring(texts, k)
