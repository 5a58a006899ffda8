"""Image quality gates + duplicate-caption detection (operators/imagequality)."""

import pyspark.sql.functions as F
import pytest

from sparkschema.operators.imagequality import (
    caption_printable_ratio,
    duplicate_caption_groups,
    image_quality_frame,
    image_quality_report,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string")


GOOD = ("ok-1", bytearray(b"\x00" * (9 + 64 * 64 * 3)), 64, 64, "raw",
        "a fine caption here")


def test_gates_and_precedence(spark):
    rows = [
        GOOD,
        # dims: too small / NULL dims / pixel bomb
        ("dim-1", None, 16, 64, "raw", "a fine caption here"),
        ("dim-2", None, None, 64, "raw", "a fine caption here"),
        ("dim-3", None, 65536, 65536, "raw", "a fine caption here"),
        # aspect: 512/64 = 8 > 4
        ("asp-1", None, 512, 64, "raw", "a fine caption here"),
        # bpp: 10 bytes over 64*64 px = 0.0024 < 0.05
        ("bpp-1", bytearray(b"\x00" * 10), 64, 64, "raw",
         "a fine caption here"),
        # caption: NULL / too short / one token / control chars
        ("cap-1", None, 64, 64, "raw", None),
        ("cap-2", None, 64, 64, "raw", "tiny"),
        ("cap-3", None, 64, 64, "raw", "single-token-caption"),
        ("cap-4", None, 64, 64, "raw", "bad caption \x00\x01\x02\x03\x04"),
        # dims fails first even though caption also fails (precedence)
        ("pre-1", None, 16, 64, "raw", None),
    ]
    out = {r["image_id"]: r for r in
           image_quality_frame(_frame(spark, rows)).collect()}
    assert out["ok-1"]["keep"] and out["ok-1"]["drop_reason"] is None
    for iid in ("dim-1", "dim-2", "dim-3", "pre-1"):
        assert out[iid]["drop_reason"] == "dims", iid
    assert out["asp-1"]["drop_reason"] == "aspect"
    assert out["bpp-1"]["drop_reason"] == "bpp"
    for iid in ("cap-1", "cap-2", "cap-3", "cap-4"):
        assert out[iid]["drop_reason"] == "caption", iid


def test_null_bytes_pass_bpp_and_report_sums(spark):
    rows = [GOOD,
            ("nb-1", None, 64, 64, "raw", "a fine caption here"),
            ("cap-1", None, 64, 64, "raw", None),
            ("asp-1", None, 512, 64, "raw", "a fine caption here")]
    rep = image_quality_report(_frame(spark, rows)).collect()[0]
    assert rep["total"] == 4 and rep["kept"] == 2
    assert rep["drop_caption"] == 1 and rep["drop_aspect"] == 1
    assert (rep["kept"] + rep["drop_dims"] + rep["drop_aspect"]
            + rep["drop_bpp"] + rep["drop_caption"]) == rep["total"]


def test_printable_ratio_edges(spark):
    df = spark.createDataFrame(
        [("", ), ("abcd", ), ("ab\x00\x01", ), (None, ), ("\t\n ok", )],
        "c string")
    vals = [r[0] for r in
            df.select(caption_printable_ratio(F.col("c"))).collect()]
    assert vals[0] == 1.0 and vals[1] == 1.0
    assert vals[2] == pytest.approx(0.5)
    assert vals[3] is None
    assert vals[4] == 1.0  # \t and \n are allowed whitespace, not control


def test_bytes_col_none_skips_bpp(spark):
    rows = [("bpp-1", bytearray(b"\x00" * 10), 64, 64, "raw",
             "a fine caption here")]
    out = image_quality_frame(_frame(spark, rows), bytes_col=None).collect()[0]
    assert out["bpp_ok"] and out["keep"]


def test_duplicate_caption_groups(spark):
    rows = [
        ("a", None, 64, 64, "raw", "Same   Caption"),
        ("b", None, 64, 64, "raw", "same caption"),   # normalizes equal
        ("b", None, 64, 64, "raw", "same caption"),   # same image again
        ("c", None, 64, 64, "raw", "unique caption"),
        ("d", None, 64, 64, "raw", None),
        ("e", None, 64, 64, "raw", "   "),            # empty after trim
    ]
    got = duplicate_caption_groups(_frame(spark, rows)).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_rows"] == 3 and g["n_images"] == 2 and g["min_id"] == "a"


def test_quality_frame_is_shuffle_and_python_free(spark, tmp_path):
    path = str(tmp_path / "imgs")
    _frame(spark, [GOOD]).write.parquet(path)
    plan = image_quality_frame(spark.read.parquet(path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bytes_col_none_prunes_byte_read(spark, tmp_path):
    path = str(tmp_path / "imgs2")
    _frame(spark, [GOOD]).write.parquet(path)
    f = image_quality_frame(spark.read.parquet(path), bytes_col=None) \
        .select("image_id", "keep")
    plan = f._jdf.queryExecution().executedPlan().toString()
    import re
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "bytes" not in schema  # the binary column is pruned from the scan
