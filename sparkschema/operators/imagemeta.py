"""Byte-container structural validation — pure Catalyst, zero decode.

Validates the engine codec's container layout
(functions/imagecodec.py:10-16 — ``magic "SSI1" | u16 w LE | u16 h LE |
u8 fmt_code | payload``) directly on the binary column with built-in
byte functions: header magic, header-vs-column ``w``/``h``/``fmt``
agreement, and the exact payload length for uncompressed formats. This
is the cheap structural gate a 10^12-row pipeline runs BEFORE any
Arrow-batched decode: a whole-stage-codegen projection per partition, no
Python, no shuffle — truncated, mislabeled, or header-corrupt blobs are
quarantined at scan speed and only the survivors pay the decode.

``rawz`` payload length requires decompression, so only its header is
structurally checked here (the round-trip PSNR pass still catches its
payload corruption downstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkschema.functions.imagecodec import FMT_CODES, MAGIC


def _u8(col: Column, pos: int) -> Column:
    """Unsigned byte at 1-based ``pos`` of a binary column."""
    return F.conv(F.hex(F.substring(col, pos, 1)), 16, 10).cast("int")


def _u16le(col: Column, pos: int) -> Column:
    return _u8(col, pos) + _u8(col, pos + 1) * 256


def container_meta_frame(df: DataFrame, bytes_col: str = "bytes",
                         w_col: str = "w", h_col: str = "h",
                         fmt_col: str = "fmt") -> DataFrame:
    """Per-row structural facts: ``header_ok``, ``dims_match``,
    ``fmt_match``, ``length_ok``, ``meta_ok`` appended to ``df``.

    NULL bytes ⇒ every check false (a byte row is required here; absent
    payloads are the ``required`` keyword's business upstream)."""
    b = F.col(bytes_col)
    header_ok = (F.octet_length(b) >= 9) & (F.substring(b, 1, 4) == F.lit(MAGIC))
    dims_match = (_u16le(b, 5) == F.col(w_col)) & (_u16le(b, 7) == F.col(h_col))
    code = _u8(b, 9)
    code_expected = F.lit(None).cast("int")
    for name, c in FMT_CODES.items():
        code_expected = F.when(F.col(fmt_col) == name, c).otherwise(code_expected)
    fmt_match = code == code_expected
    uncompressed = F.col(fmt_col).isin(
        [n for n, c in FMT_CODES.items() if n != "rawz"])
    length_ok = F.when(
        uncompressed,
        F.octet_length(b) == 9 + F.col(w_col).cast("long")
        * F.col(h_col).cast("long") * 3).otherwise(F.lit(True))
    checks = {
        "header_ok": F.coalesce(header_ok, F.lit(False)),
        "dims_match": F.coalesce(header_ok & dims_match, F.lit(False)),
        "fmt_match": F.coalesce(header_ok & fmt_match, F.lit(False)),
        "length_ok": F.coalesce(header_ok & length_ok, F.lit(False)),
    }
    out = df
    for name, c in checks.items():
        out = out.withColumn(name, c)
    return out.withColumn(
        "meta_ok", F.col("header_ok") & F.col("dims_match")
        & F.col("fmt_match") & F.col("length_ok"))


def container_meta_verdict(df: DataFrame, **cols) -> DataFrame:
    """One-row structural verdict: totals per failure class."""
    f = container_meta_frame(df, **cols)
    # coalesces: an empty input is a vacuous pass with zero counters
    # (sum over zero rows is NULL — review find r4); the DuckDB oracle
    # twin carries the same coalesce to stay in lockstep
    return f.agg(
        F.lit("container:meta").alias("check"),
        F.coalesce(F.sum((~F.col("meta_ok")).cast("long")) == 0,
                   F.lit(True)).alias("pass"),
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum((~F.col("header_ok")).cast("long")), F.lit(0))
         .alias("bad_header"),
        F.coalesce(F.sum((F.col("header_ok") & ~F.col("dims_match"))
                         .cast("long")), F.lit(0)).alias("dims_mismatch"),
        F.coalesce(F.sum((F.col("header_ok") & ~F.col("fmt_match"))
                         .cast("long")), F.lit(0)).alias("fmt_mismatch"),
        F.coalesce(F.sum((F.col("header_ok") & ~F.col("length_ok"))
                         .cast("long")), F.lit(0)).alias("bad_length"),
    )
