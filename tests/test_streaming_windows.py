"""Watermarked windowed violation counts over a file stream."""

from pyspark.sql import functions as F

from sparkschema.streaming.validate_stream import windowed_violation_counts


def test_windowed_violation_counts(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [(i,
             f"2024-01-01 {i % 3:02d}:15:00",
             i % 10,  # v<3 violates minimum:3
             ) for i in range(300)]
    (spark.createDataFrame(rows, "id long, ts_s string, v int")
          .select("id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
          .write.parquet(src))
    stream = spark.readStream.schema("id long, ts timestamp, v int").parquet(src)
    spec = {"properties": {"v": {"type": "integer", "minimum": 3}}}
    counts = windowed_violation_counts(stream, spec, ["id"], "ts",
                                       window="1 hour", watermark="2 hours")
    out = str(tmp_path / "out")

    q = (counts.writeStream.outputMode("complete")
         .format("memory").queryName("winviol")
         .option("checkpointLocation", out)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window.start.hour, r.keyword): r.cnt
           for r in spark.sql("select * from winviol").collect()}
    # 300 ids over 3 hourly windows; v = i%10 → 3 violations per 10 ids
    assert got == {(0, "minimum"): 30, (1, "minimum"): 30, (2, "minimum"): 30}
