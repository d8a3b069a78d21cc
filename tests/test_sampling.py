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
