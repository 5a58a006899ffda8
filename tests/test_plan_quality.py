"""Physical-plan assertions: the shapes the engine promises at 100 TB
(SURVEY.md §4). These test the *plan*, not the result — a regression that
adds a shuffle or loses pushdown fails here even if answers stay right."""

from pyspark.sql import functions as F

from sparkschema.compiler.table import compile_table_spec
from sparkschema.operators.referential import orphans
from sparkschema.operators.stats import column_stats
from sparkschema.sources.synthetic import images_df

SPEC = {
    "type": "object",
    "required": ["image_id", "fmt"],
    "properties": {
        "image_id": {"type": "string", "pattern": "^img-[0-9]{12}$"},
        "w": {"type": "integer", "minimum": 1, "maximum": 16384},
        "fmt": {"enum": ["raw", "rawz", "png", "jpg"]},
    },
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_violations_plan_has_no_exchange(spark, tmp_path):
    path = str(tmp_path / "imgs")
    images_df(spark, 1000, partitions=4).write.parquet(path)
    imgs = spark.read.parquet(path)
    cts = compile_table_spec(SPEC, imgs, key_cols=["image_id"])
    plan = _plan(cts.violations(imgs))
    assert "Exchange" not in plan, plan
    assert "*(" in plan  # codegen'd stages render as *(n) in plan strings


def test_violations_scan_prunes_unused_columns(spark, tmp_path):
    path = str(tmp_path / "imgs2")
    images_df(spark, 1000, with_bytes=True, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path)
    cts = compile_table_spec(SPEC, imgs, key_cols=["image_id"])
    plan = _plan(cts.violations(imgs))
    # the heavy binary column is not referenced by any check → never read
    assert "bytes" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "imgs3")
    images_df(spark, 1000, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path).where(F.col("fmt") == "jpg")
    cts = compile_table_spec(SPEC, imgs, key_cols=["image_id"])
    plan = _plan(cts.violations(imgs))
    assert "PushedFilters: [IsNotNull(fmt), EqualTo(fmt,jpg)]" in plan \
        or "EqualTo(fmt,jpg)" in plan, plan


def test_verdicts_single_aggregation_exchange(spark, tmp_path):
    path = str(tmp_path / "imgs4")
    images_df(spark, 1000, partitions=4).write.parquet(path)
    imgs = spark.read.parquet(path)
    cts = compile_table_spec(SPEC, imgs, key_cols=["image_id"])
    plan = _plan(cts.verdicts(imgs))
    assert plan.count("Exchange") <= 2  # partial→final (+AQE read)
    assert "HashAggregate" in plan


def test_referential_broadcasts_small_dim(spark, tmp_path):
    path = str(tmp_path / "imgs5")
    images_df(spark, 1000, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path)
    dim = spark.createDataFrame([("jpg",), ("png",)], "fmt string")
    plan = _plan(orphans(imgs, "fmt", dim, "fmt", strategy="broadcast"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # fact side must not shuffle
    assert "Exchange hashpartitioning" not in plan.split("BroadcastHashJoin")[0]


def test_stats_reads_only_requested_columns(spark, tmp_path):
    path = str(tmp_path / "imgs6")
    images_df(spark, 1000, with_bytes=True, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path)
    plan = _plan(column_stats(imgs, ["w", "fmt"]))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema and "caption" not in read_schema


def test_bucketed_roundtrip_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed byte tables (the Iceberg bucket(image_id) stand-in)
    join for the round-trip check with NO exchange and exactly ONE Arrow
    UDF evaluation — at 10^12 scale the byte corpus never shuffles."""
    from sparkschema.operators.roundtrip import roundtrip_verdict
    from sparkschema.sources.tables import ensure_bucketed_table

    clean = dict(dup_fraction=0.0, orphan_fmt_fraction=0.0,
                 caption_anomaly_fraction=0.0, corrupt_fraction=0.0,
                 caption_mismatch_fraction=0.0)
    src = images_df(spark, 400, with_bytes=True, partitions=2, **clean)
    ref = images_df(spark, 400, with_bytes=True, variant="ref", partitions=2,
                    **clean)
    a = ensure_bucketed_table(spark, "pq_bkt_a", str(tmp_path / "a"),
                              source_df=src, buckets=4)
    b = ensure_bucketed_table(spark, "pq_bkt_b", str(tmp_path / "b"),
                              source_df=ref, buckets=4)
    v = roundtrip_verdict(a, b)
    plan = _plan(v)
    assert "SortMergeJoin" in plan
    assert plan.count("ArrowEvalPython") == 1
    # the only exchange allowed is the final single-row aggregation step
    join_part = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_part, join_part
    row = v.collect()[0]
    assert row["rows"] == 400 and bool(row["pass"])
    spark.sql("drop table if exists pq_bkt_a")
    spark.sql("drop table if exists pq_bkt_b")


def test_events_variant_query_materializes_parses_once(spark):
    """The nine-arm events query must keep its double-barrier shape:
    scan -> hash repartition (spread the single-file scan) -> Project
    computing the three try_parse_json documents ONCE -> round-robin
    barrier -> Project computing the verdict structs ONCE (all
    interpreted VARIANT work) -> round-robin barrier carrying only
    booleans -> aggregate partial + final exchange. Exactly four
    Exchanges. Without the barriers, CollapseProject inlines each
    concat+parse into every predicate tree and each verdict struct into
    every aggregate reference (interpreted expressions get no CSE) —
    measured 96 s (no parse barrier) / 4.3 s (no verdict barrier) vs
    ~0.3 s at sf0.1."""
    import importlib

    m = importlib.import_module("__spark_entry__")
    df = m.queries()["events_json_invalid"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("Exchange") == 4, plan
    assert "HashAggregate" in plan
    # the final pre-aggregate exchange must carry booleans, not variants:
    # no variant-typed attribute may survive past the second barrier
    post_agg = plan.split("HashAggregate")[0]
    assert "variant" not in post_agg.lower(), post_agg


def test_sessionize_single_exchange_on_user_key(spark, tmp_path):
    from sparkschema.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(i % 7, __import__("datetime").datetime(2024, 1, 1, 0, i % 60))
         for i in range(100)], "user_id int, ts timestamp")
    plan = _plan(sessionize(df, "user_id", "ts", "30 minutes"))
    # one hash exchange keyed by the user; session merge happens inside
    # the aggregate, never a window sort over the whole table
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_asof_join_right_payload_crosses_exchange_once(spark, tmp_path):
    from sparkschema.operators.sessions import asof_join

    import datetime as dt
    left = spark.createDataFrame(
        [(i, i % 5, dt.datetime(2024, 1, 1, 0, i % 60)) for i in range(50)],
        "eid int, k int, ts timestamp")
    right = spark.createDataFrame(
        [(i % 5, dt.datetime(2024, 1, 1, 0, i % 60), float(i))
         for i in range(40)], "k int, ts timestamp, v double")
    plan = _plan(asof_join(left, right, "k", "ts", "ts", value_cols=["v"]))
    assert plan.count("Exchange hashpartitioning") == 1  # the union, keyed
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_line_dedup_uses_agg_then_join_not_window(spark, tmp_path):
    from sparkschema.operators.dedup import line_dedup

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"HEADER\nbody {i}\nFOOTER") for i in range(200)],
        "doc_id long, text string").write.parquet(path)
    plan = _plan(line_dedup(spark.read.parquet(path), "text", "doc_id"))
    # first-occurrence selection must be the map-side-combinable
    # min(struct) aggregate + join, never a row_number window (which
    # would sort every occurrence of the hottest line in one task)
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_curation_report_is_one_aggregate_with_broadcast_contamination(
        spark, tmp_path):
    from sparkschema.plans.curation_run import curate_corpus

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"document number {i} with plenty of the and of words in it "
             f"to clear the thresholds {i}", f"s{i % 3}")
         for i in range(300)],
        "doc_id long, text string, source string").write.parquet(path)
    d = spark.read.parquet(path)
    res = curate_corpus(
        d, "text", "doc_id",
        languages=["en"], min_quality=0.3, min_tokens=3,
        eval_df=d.where(F.col("doc_id") < 5),
        per_source_cap=50, source_col="source")
    plan = _plan(res.report)
    # the eval-set gram side broadcasts (corpus grams never shuffle to
    # the contamination join) and the attribution report collapses to
    # ONE final single-partition aggregate
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_exchange_no_python(spark):
    from sparkschema.operators.packing import pack_sequences

    df = spark.range(500).withColumnRenamed("id", "doc_id") \
              .withColumn("tokens", (F.col("doc_id") % 37).cast("bigint"))
    plan = _plan(pack_sequences(df, "doc_id", "tokens", 128, 8))
    # one hash exchange on the md5 bucket feeds the per-bucket window;
    # the layout itself is pure expression work — no Python stage
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_weighted_mix_is_pushdown_filter(spark, tmp_path):
    from sparkschema.operators.sampling import weighted_sample_by_group

    p = str(tmp_path / "docs.parquet")
    spark.range(200).withColumnRenamed("id", "doc_id") \
         .withColumn("source", F.concat(F.lit("s"),
                                        (F.col("doc_id") % 3))) \
         .write.parquet(p)
    kept = weighted_sample_by_group(
        spark.read.parquet(p), "doc_id", "source",
        {"s0": 0.5, "s1": 0.9}, default=0.1)
    plan = _plan(kept)
    # a mix is a pure filter fused into the scan stage: zero exchanges,
    # zero Python, threshold CASE evaluated in whole-stage codegen
    assert "Exchange" not in plan and "Python" not in plan
    assert "CASE WHEN" in plan


def test_normalize_single_arrow_stage_no_exchange(spark):
    from sparkschema.operators.normalize import (nfc_normalize_col,
                                                 scrub_control_chars)

    df = spark.range(100).withColumn("text", F.lit("á b"))
    out = df.select(scrub_control_chars(
        nfc_normalize_col(F.col("text"))).alias("s"))
    plan = _plan(out)
    assert plan.count("ArrowEvalPython") == 1   # one batched UDF stage
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan        # never row-at-a-time


def test_quality_report_single_aggregation_exchange(spark, tmp_path):
    """The 12-gate quality report over the metadata table must be one
    partial->final aggregate: exactly one exchange carrying one row per
    partition, gates fused into the scan by codegen."""
    from sparkschema.operators.imagequality import image_quality_report

    path = str(tmp_path / "imgq")
    images_df(spark, 1000, partitions=4).write.parquet(path)
    rep = image_quality_report(spark.read.parquet(path), bytes_col=None)
    rep.collect()  # finalize AQE so codegen markers render
    # the finalized AQE string repeats the plan under "== Initial Plan ==";
    # count exchanges in the final section only
    plan = _plan(rep).split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan
    assert "*(" in plan


def test_drift_statistics_bucket_windows_only(spark):
    """drift_statistics_histograms runs its windows over the joined
    bucket frame (<= ~65 rows) — no Python, and the full-frame window is
    a single bounded partition, not a per-row sort of the input."""
    from sparkschema.operators.drift import drift_statistics_histograms
    from sparkschema.operators.imagedup import phash_weight_histogram

    imgs = images_df(spark, 2000, partitions=4)
    h1 = phash_weight_histogram(imgs.where(F.col("w") >= 128))
    h2 = phash_weight_histogram(imgs.where(F.col("w") < 128))
    plan = _plan(drift_statistics_histograms(h1, h2))
    assert "Python" not in plan
    assert "Window" in plan
