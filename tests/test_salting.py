"""Salted-join correctness: salting must never change results, only
partitioning — verified for inner and left joins on a skewed key, plus the
salt-factor chooser and the salted presence path."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark.operators import salting
from phenoscape_owl_tools_spark.plans.kb_build import (
    _phenotype_ancestors,
    _taxon_phenotypes,
)


def _skewed(spark):
    # hub key 'h' carries 80% of probe rows
    probe = spark.createDataFrame(
        [Row(k="h" if i % 5 else f"k{i}", v=i) for i in range(200)]
    )
    build = spark.createDataFrame(
        [Row(bk="h", w="hub"), Row(bk="k5", w="five"), Row(bk="zz", w="none")]
    )
    return probe, build


def _norm(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_salted_inner_join_equals_plain(spark):
    probe, build = _skewed(spark)
    plain = probe.join(build, probe["k"] == build["bk"]).select("k", "v", "w")
    salted = salting.salted_join(probe, build, "k", "bk", salt=8).select("k", "v", "w")
    assert _norm(salted.collect(), ["k", "v", "w"]) == _norm(plain.collect(), ["k", "v", "w"])


def test_salted_left_join_equals_plain(spark):
    probe, build = _skewed(spark)
    plain = probe.join(build, probe["k"] == build["bk"], "left").select("k", "v", "w")
    salted = salting.salted_join(probe, build, "k", "bk", salt=8, how="left").select("k", "v", "w")
    assert _norm(salted.collect(), ["k", "v", "w"]) == _norm(plain.collect(), ["k", "v", "w"])


def test_choose_salt_factor(spark):
    probe, _ = _skewed(spark)
    assert salting.choose_salt_factor(probe, "k", target_per_key=500_000) == 1
    assert salting.choose_salt_factor(probe, "k", target_per_key=40) == 4
    assert salting.choose_salt_factor(probe.limit(0), "k") == 1


def test_phenotype_ancestors_salt_invariant(spark):
    exhibits = spark.createDataFrame(
        [Row(subj=f"t{i % 3}", pred="ex", obj=f"s{i}") for i in range(30)]
    )
    describes = spark.createDataFrame(
        [Row(subj=f"s{i}", pred="de", obj="hub_ph" if i % 2 else f"ph{i}") for i in range(30)]
    )
    closure = spark.createDataFrame(
        [Row(sub="hub_ph", sup="presence_cls"), Row(sub="ph3", sup="other")]
    )
    tx_ph = _taxon_phenotypes(exhibits, describes)
    base = _phenotype_ancestors(tx_ph, closure, salt=1)
    salted = _phenotype_ancestors(tx_ph, closure, salt=6)
    auto = _phenotype_ancestors(tx_ph, closure, salt=None)
    cols = ["taxon", "cls"]
    expect = _norm(base.collect(), cols)
    assert _norm(salted.collect(), cols) == expect
    assert _norm(auto.collect(), cols) == expect
