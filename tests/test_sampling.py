"""Deterministic corpus sampling / mixing / splitting (dataops.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.dataops.sampling import (
    hash_fraction,
    hash_split,
    sample_by_rate,
    temperature_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr"))
            for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, lang string").cache()


def test_hash_fraction_uniform_and_deterministic(spark, docs):
    fr = docs.select(hash_fraction(F.col("doc_id")).alias("f"))
    stats = fr.agg(
        F.min("f").alias("lo"), F.max("f").alias("hi"), F.avg("f").alias("mu")
    ).first()
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert 0.45 < stats["mu"] < 0.55  # uniform-ish over 1000 keys
    # identical across evaluations (no RNG state)
    a = sorted(r["f"] for r in fr.collect())
    b = sorted(r["f"] for r in fr.collect())
    assert a == b


def test_sample_by_rate_extremes_and_monotone_nesting(docs):
    kept_all = sample_by_rate(docs, {"en": 1.0}, default_rate=0.0)
    assert kept_all.select("lang").distinct().collect() == [("en",)]
    assert kept_all.count() == docs.where("lang = 'en'").count()
    assert sample_by_rate(docs, {}, default_rate=0.0).count() == 0
    # hash-threshold samples NEST: the 30% sample is a subset of the 60%
    # one (the property that makes rate changes reproducible downstream)
    s30 = {r["doc_id"] for r in
           sample_by_rate(docs, {"en": 0.3, "de": 0.3, "fr": 0.3}).collect()}
    s60 = {r["doc_id"] for r in
           sample_by_rate(docs, {"en": 0.6, "de": 0.6, "fr": 0.6}).collect()}
    assert s30 <= s60
    assert len(s30) == pytest.approx(300, abs=60)


def test_sample_by_rate_validates_rates(docs):
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sample_by_rate(docs, {"en": 1.5})


def test_sample_by_rate_is_map_only(docs):
    plan = sample_by_rate(
        docs, {"en": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row filter, no shuffle


def test_temperature_mix_alpha_one_is_identity(docs):
    assert temperature_mix(docs, alpha=1.0).count() == docs.count()


def test_temperature_mix_flattens_toward_uniform(docs):
    orig = dict(
        (r["lang"], r["n"])
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    mixed = temperature_mix(docs, alpha=0.5)
    kept = dict(
        (r["lang"], r["n"])
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    # the smallest group is kept in full (rate = 1); larger groups thin
    smallest = min(orig, key=orig.get)
    assert kept[smallest] == orig[smallest]
    # skew shrinks: max/min group ratio moves toward the alpha target
    assert max(kept.values()) / min(kept.values()) < (
        max(orig.values()) / min(orig.values())
    )
    # expected rate for group g is (n_g/n_min)^(alpha-1): kept ≈ n_g * r_g
    n_min = min(orig.values())
    for g, n in orig.items():
        exp = n * (n / n_min) ** (0.5 - 1.0)
        assert kept[g] == pytest.approx(exp, rel=0.25), (g, kept[g], exp)


def test_temperature_mix_validates_alpha(docs):
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(docs, alpha=0.0)


def test_hash_split_partitions_exactly(docs):
    out = hash_split(docs, {"train": 0.75, "val": 0.125, "test": 0.125})
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert sum(counts.values()) == docs.count()  # exhaustive
    assert set(counts) == {"train", "val", "test"}  # all intervals hit
    assert counts["train"] == pytest.approx(750, abs=80)
    # disjoint + stable: the same id always lands in the same split, even
    # when assigned within a filtered subset (join-stability)
    sub = hash_split(
        docs.where("doc_id % 2 = 0"),
        {"train": 0.75, "val": 0.125, "test": 0.125},
    )
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_hash_split_validates_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, {"train": 1.5, "val": -0.5})


# ---------------------------------------------------------- cap per group


def test_cap_per_group_equals_windowed_oracle(spark):
    """The bucketed selection must keep EXACTLY the global top-n per group
    by (md5(id), id) — the plain windowed definition — including under
    90% single-group skew, and never sort a whole group to get there."""
    import hashlib

    from debezium_spark.dataops.sampling import cap_per_group

    # skew: group 'hot' holds 900 of 1000 rows
    rows = [(i, "hot" if i < 900 else f"cold{i % 7}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["doc_id"] for r in cap_per_group(docs, 10, group_col="source").collect()}
    want = set()
    by_group: dict[str, list[int]] = {}
    for i, g in rows:
        by_group.setdefault(g, []).append(i)
    for g, ids in by_group.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want.update(ids[:10])
    assert got == want
    # every group capped at 10; cold groups smaller than 10 survive whole
    sizes = {
        r["source"]: r["count"]
        for r in cap_per_group(docs, 10, group_col="source")
        .groupBy("source").count().collect()
    }
    assert sizes["hot"] == 10
    assert all(v <= 10 for v in sizes.values())


def test_cap_per_group_edges(spark):
    import pytest

    from debezium_spark.dataops.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    assert cap_per_group(docs, 0, group_col="source").count() == 0
    assert cap_per_group(docs, 5, group_col="source").count() == 3
    with pytest.raises(ValueError):
        cap_per_group(docs, -1, group_col="source")


def test_cap_per_group_decision_join_is_broadcast(spark):
    from debezium_spark.dataops.sampling import cap_per_group

    docs = spark.createDataFrame(
        [(i, "g") for i in range(50)], "doc_id long, source string"
    )
    plan = (
        cap_per_group(docs, 5, group_col="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_group_is_sampled_not_deleted(spark):
    """Final review r5: the join back from the per-group decisions used a
    plain equi-join, so NULL-group rows (counted by the groupBy!) never
    matched and the whole NULL group vanished — in cap_per_group AND
    temperature_mix. NULL groups must be capped/sampled like any other."""
    from debezium_spark.dataops.sampling import cap_per_group, temperature_mix

    rows = [(i, None if i < 20 else "en") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")

    capped = cap_per_group(docs, 10, group_col="lang").collect()
    by_g = {}
    for r in capped:
        by_g.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_g[None]) == 10, "NULL group must be capped to n, not deleted"
    assert len(by_g["en"]) == 10
    # NULL-id rows survive too (their bucket hash is NULL)
    docs2 = spark.createDataFrame(
        [(None, "en"), (1, "en"), (2, "en")], "doc_id long, lang string"
    )
    assert cap_per_group(docs2, 10, group_col="lang").count() == 3

    mixed = temperature_mix(docs, alpha=1.0, group_col="lang")
    got = {r["lang"] for r in mixed.select("lang").distinct().collect()}
    assert None in got, "alpha=1 keeps everything — including the NULL group"
    assert mixed.count() == 120
