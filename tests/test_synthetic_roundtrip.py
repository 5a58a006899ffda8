"""Synthetic image table + codec + round-trip operator tests (P1/P4)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkschema.functions import imagecodec as ic
from sparkschema.operators.roundtrip import roundtrip_frame, roundtrip_verdict, roundtrip_violations
from sparkschema.sources.synthetic import dim_fmt_df, images_df


def test_codec_roundtrip_exact_and_lossy():
    px = ic.synth_pixels("img-000000000001", 64, 64)
    for fmt in ("raw", "rawz"):
        dec, f = ic.decode(ic.encode(px, fmt))
        assert f == fmt and np.array_equal(dec, px)
    for fmt in ("jpg", "png"):
        dec, f = ic.decode(ic.encode(px, fmt))
        p = ic.psnr(px, dec)
        assert 40.0 <= p < math.inf, p  # 6-bit quantization stays ≥ 40 dB


def test_codec_corruption_detected():
    px = ic.synth_pixels("x", 16, 16)
    buf = ic.encode(px, "raw")
    with pytest.raises(ic.CorruptImage):
        ic.decode(buf[: len(buf) // 2])
    assert math.isnan(ic.psnr_bytes(buf[: len(buf) // 2], buf))


def test_generator_deterministic_and_distributed(spark):
    a = images_df(spark, 2000, partitions=4).orderBy("image_id").collect()
    b = images_df(spark, 2000, partitions=7).orderBy("image_id").collect()
    assert a == b  # partitioning must not change content
    fmts = {r.fmt for r in a}
    assert fmts <= {"raw", "rawz", "png", "jpg", "tiff"}
    assert any(r.fmt == "tiff" for r in a)           # orphan injection
    ids = [r.image_id for r in a]
    assert len(set(ids)) < len(ids)                  # dup injection
    assert all(r.w in (64, 128, 256, 512) for r in a)


def test_generator_anomaly_rates(spark):
    n = 20000
    df = images_df(spark, n)
    agg = df.agg(
        F.sum((F.col("caption") == "").cast("long")).alias("empty"),
        F.sum(F.col("caption").isNull().cast("long")).alias("nulls"),
        F.sum((F.col("fmt") == "tiff").cast("long")).alias("orphans"),
    ).collect()[0]
    assert 0 < agg.empty < n * 0.01
    assert 0 < agg.nulls < n * 0.01
    assert 0 < agg.orphans < n * 0.01


def test_roundtrip_check_end_to_end(spark):
    n = 400
    imgs = images_df(spark, n, with_bytes=True, corrupt_fraction=0.01,
                     caption_mismatch_fraction=0.01, partitions=4)
    ref = images_df(spark, n, with_bytes=True, variant="ref", partitions=4)
    verdict = roundtrip_verdict(imgs, ref).collect()[0]
    assert verdict.rows == n
    # healthy lossy images clear 40 dB: min finite PSNR ≈ 42.9
    assert verdict.min_finite_psnr_db is None or verdict.min_finite_psnr_db >= 40.0
    f = roundtrip_frame(imgs, ref)
    bad_caption = f.where(~F.col("caption_ok")).count()
    assert bad_caption > 0  # injected mismatches + anomalies detected
    viols = roundtrip_violations(imgs, ref)
    kinds = {r.keyword for r in viols.collect()}
    assert "x-roundtrip-caption" in kinds
    corrupt = [r for r in viols.collect() if r.msg.startswith("Image buffer")]
    assert corrupt  # injected truncations detected


def test_dim_fmt(spark):
    assert {r.fmt for r in dim_fmt_df(spark).collect()} == {"raw", "rawz", "png", "jpg"}
