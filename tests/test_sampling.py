"""Deterministic hash split/sample semantics (the bulk assignment values
are oracle-checked in test_entry_contract::hash_split_documents; these
pin the properties the oracle can't isolate)."""

import pytest
from pyspark.sql import functions as F

from sparkschema.operators.sampling import (cap_per_group, hash_fraction,
                                            hash_sample, hash_split)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_proportions_and_totality(spark):
    df = _ids(spark)
    counts = {r.split: r.n for r in
              hash_split(df, "doc_id", {"train": 0.8, "val": 0.1,
                                        "test": 0.1})
              .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000          # every row assigned
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85  # ~binomial tolerance


def test_split_is_stable_across_partitionings(spark):
    df = _ids(spark, 500)
    a = {(r.doc_id, r.split) for r in
         hash_split(df, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    b = {(r.doc_id, r.split) for r in
         hash_split(df.repartition(13), "doc_id",
                    {"a": 0.5, "b": 0.5}).collect()}
    assert a == b


def test_salt_versions_the_split(spark):
    df = _ids(spark, 500)
    a = {(r.doc_id, r.split) for r in
         hash_split(df, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    c = {(r.doc_id, r.split) for r in
         hash_split(df, "doc_id", {"a": 0.5, "b": 0.5},
                    salt="v2").collect()}
    assert a != c  # 2^-500 false-failure probability


def test_samples_nest(spark):
    df = _ids(spark)
    small = {r.doc_id for r in hash_sample(df, "doc_id", 0.01).collect()}
    big = {r.doc_id for r in hash_sample(df, "doc_id", 0.10).collect()}
    assert small <= big
    assert len(big) < 2000


def test_null_id_gets_null_split_and_bad_weights_raise(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id int")
    rows = {r.doc_id: r.split
            for r in hash_split(df, "doc_id", {"x": 1.0}).collect()}
    assert rows[1] == "x" and rows[None] is None
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"x": 0.5})
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)


def test_cap_per_group_caps_and_is_deterministic(spark):
    df = _ids(spark).withColumn("grp", (F.col("doc_id") % 3).cast("string"))
    kept = cap_per_group(df, "grp", "doc_id", 10)
    counts = {r.grp: r.n for r in
              kept.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    assert counts == {"0": 10, "1": 10, "2": 10}
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in
         cap_per_group(df.repartition(17), "grp", "doc_id", 10).collect()}
    assert a == b  # survivor set independent of partitioning
    # a group smaller than k survives whole
    small = spark.createDataFrame([("g", i) for i in range(3)],
                                  "grp string, doc_id int")
    assert cap_per_group(small, "grp", "doc_id", 10).count() == 3
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", "doc_id", 0)


def test_cap_per_group_salt_and_null_id_evicted_first(spark):
    df = _ids(spark, 200).withColumn("grp", F.lit("g"))
    a = {r.doc_id for r in cap_per_group(df, "grp", "doc_id", 20).collect()}
    c = {r.doc_id for r in
         cap_per_group(df, "grp", "doc_id", 20, salt="v2").collect()}
    assert a != c  # salt reshuffles priority
    withnull = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None)], "grp string, doc_id int")
    kept = {r.doc_id for r in
            cap_per_group(withnull, "grp", "doc_id", 2).collect()}
    assert kept == {1, 2}  # NULL priority sorts last => evicted first


def test_hash_fraction_range_and_plan_is_pure_filter(spark):
    df = _ids(spark)
    mm = df.select(F.min(hash_fraction(F.col("doc_id"))).alias("lo"),
                   F.max(hash_fraction(F.col("doc_id"))).alias("hi")) \
           .collect()[0]
    assert 0.0 <= mm.lo and mm.hi < 1.0
    plan = hash_sample(df, "doc_id", 0.1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # sampling never shuffles
