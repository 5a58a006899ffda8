"""applyInPandasWithState custom stateful operator: per-key cumulative
violation tracking with quarantine, state persisted across restarts via
the streaming checkpoint."""

import pytest
from pyspark.sql import functions as F

from sparkschema.streaming.stateful import keyed_violation_state

SPEC = {
    "type": "object",
    "properties": {"w": {"type": "integer", "minimum": 1}},
    "required": ["image_id"],
}


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "image_id string, w int") \
         .repartition(1).write.mode("append").parquet(path)


def _run_once(spark, src, chk, sink_name, max_violations):
    # foreachBatch sink: the memory sink cannot recover from a checkpoint,
    # and recovery across restarts is exactly what this test exercises
    stream = spark.readStream.schema("image_id string, w int").parquet(src)
    out = keyed_violation_state(stream, SPEC, "image_id",
                                max_violations=max_violations)
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return {r.key: r for r in collected}


@pytest.mark.filterwarnings("ignore")
def test_keyed_violation_state_accumulates_and_quarantines(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    # batch 1: key 'a' has 2 violations (w=0), 'b' is clean
    _write_batch(spark, src, [("a", 0), ("a", 0), ("a", 5), ("b", 7)])
    got1 = _run_once(spark, src, chk, "state_sink1", max_violations=3)
    assert got1["a"].rows_total == 3 and got1["a"].violations_total == 2
    assert not got1["a"].quarantined
    assert got1["b"].violations_total == 0

    # batch 2 (restart from checkpoint): 'a' crosses the budget → quarantined;
    # totals prove the state survived the restart
    _write_batch(spark, src, [("a", 0), ("a", 0), ("b", 9)])
    got2 = _run_once(spark, src, chk, "state_sink2", max_violations=3)
    assert got2["a"].rows_total == 5
    assert got2["a"].violations_total == 4
    assert got2["a"].quarantined
    assert got2["b"].rows_total == 2 and not got2["b"].quarantined


def test_state_store_never_sees_payload_columns(spark, tmp_path):
    """The stateful operator's input projection is (key, invalid) only —
    payload bytes must not enter the state store exchange."""
    src = str(tmp_path / "src_plan")
    _write_batch(spark, src, [("a", 1)])
    stream = spark.readStream.schema("image_id string, w int").parquet(src)
    out = keyed_violation_state(stream, SPEC, "image_id")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "invalid" in plan
    assert "FlatMapGroupsInPandasWithState" in plan or "applyInPandasWithState" in plan.lower()
