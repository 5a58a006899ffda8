"""Structural container validation: pure-Catalyst checks must agree with
the Python codec's structural view, row by row, and keep a decode-free
plan."""

import struct

from pyspark.sql import functions as F

from sparkschema.functions.imagecodec import FMT_CODES, MAGIC, decode
from sparkschema.operators.imagemeta import (container_meta_frame,
                                             container_meta_verdict)
from sparkschema.sources.synthetic import images_df


def _structurally_ok(buf, w, h, fmt):
    if buf is None or len(buf) < 9 or buf[:4] != MAGIC:
        return False
    hw, hh, code = struct.unpack("<HHB", buf[4:9])
    if (hw, hh) != (w, h) or FMT_CODES.get(fmt) != code:
        return False
    if fmt != "rawz" and len(buf) != 9 + w * h * 3:
        return False
    return True


def test_meta_matches_python_codec_row_by_row(spark):
    df = images_df(spark, 400, with_bytes=True, partitions=2,
                   corrupt_fraction=0.15)
    rows = df.select("image_id", "bytes", "w", "h", "fmt").collect()
    expected = {r.image_id: _structurally_ok(bytes(r.bytes) if r.bytes
                                             is not None else None,
                                             r.w, r.h, r.fmt)
                for r in rows}
    got = {r.image_id: r.meta_ok
           for r in container_meta_frame(df).select("image_id",
                                                    "meta_ok").collect()}
    mism = {k: (got[k], expected[k]) for k in expected if got[k] != expected[k]}
    assert not mism, list(mism.items())[:5]
    assert sum(1 for v in expected.values() if not v) > 0  # corpus has bad rows


def test_meta_flags_mislabeled_fmt_and_truncation(spark):
    clean = dict(dup_fraction=0.0, orphan_fmt_fraction=0.0,
                 caption_anomaly_fraction=0.0, corrupt_fraction=0.0,
                 caption_mismatch_fraction=0.0)
    df = images_df(spark, 50, with_bytes=True, partitions=1, **clean)
    # relabel fmt: header code no longer matches the column
    bad_fmt = df.withColumn(
        "fmt", F.when(F.col("fmt") == "raw", "png").otherwise("raw"))
    v = container_meta_verdict(bad_fmt).collect()[0]
    assert not v["pass"] and v["fmt_mismatch"] == v["rows"]
    # truncate every payload: uncompressed rows must fail length_ok
    cut = df.withColumn("bytes", F.substring("bytes", 1, 20))
    f = container_meta_frame(cut).where(F.col("fmt") != "rawz")
    assert f.where(F.col("length_ok")).count() == 0


def test_meta_plan_is_decode_free(spark):
    df = images_df(spark, 100, with_bytes=True, partitions=1)
    v = container_meta_verdict(df)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # single aggregation exchange only
    assert plan.count("Exchange") <= 1


def test_container_meta_verdict_empty_table(spark):
    """Review find r4: sum over zero rows is NULL — pass was NULL (read
    as failure) and counters NULL on an empty slice."""
    from pyspark.sql import functions as F

    from sparkschema.operators.imagemeta import container_meta_verdict
    from sparkschema.sources.synthetic import images_df

    imgs = images_df(spark, 10, with_bytes=True).where(F.lit(False))
    row = container_meta_verdict(imgs).collect()[0]
    assert row["pass"] is True and row["rows"] == 0
    assert row["bad_header"] == 0 and row["bad_length"] == 0
