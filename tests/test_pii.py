"""PII detection/redaction and vocabulary operators.

The corpus-level differential twins live in test_entry_contract (sf0.01
vs DuckDB) and test_pipeline_fuzz (hostile corpus); these are the
operator-semantics unit tests: pattern coverage, replacement ordering,
NULL propagation, and the vocab top-k total order.
"""

import pytest
from pyspark.sql import functions as F

from sparkschema.operators.pii import pii_redact, pii_stats_frame
from sparkschema.operators.text import vocab_topk


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return df.select(pii_redact(F.col("text")).alias("t")).first().t


def test_redaction_kinds_and_order(spark):
    got = _one(spark, "mail a.b+c@ex-ample.co.uk host 10.0.0.1 "
                      "ssn 123-45-6789 tel 555-010-1234 or 555.010.4321")
    assert got == "mail [EMAIL] host [IP] ssn [SSN] tel [PHONE] or [PHONE]"


def test_redaction_leaves_near_misses_alone(spark):
    # wrong digit groupings, bare domains, and plain numbers survive
    s = "v1.2.3.4.5 user at example.com 12-34-5678 9876543210 1-800-FLOWERS"
    # 1.2.3.4 inside v1.2.3.4.5: '1' follows 'v' (word char) so \b fails
    # at the start; the 2.3.4.5 suffix IS a legitimate ipv4 match --
    # exactly what the RE2/Java common-subset semantics say
    assert _one(spark, s) == \
        "v1.[IP] user at example.com 12-34-5678 9876543210 1-800-FLOWERS"


def test_stats_frame_counts_and_null_propagation(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and c@d.io call 555-010-1234"),
         (2, "clean text"),
         (3, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            pii_stats_frame(df, "text", "doc_id").collect()}
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_pii) == (2, 1, 3)
    assert (rows[2].n_pii, rows[2].n_email) == (0, 0)
    assert rows[2].redacted_md5 is not None
    # NULL text => NULL everything (absent doc has no PII facts)
    assert all(v is None for k, v in rows[3].asDict().items()
               if k != "doc_id")


def test_redaction_is_idempotent(spark):
    s = "a@b.co 10.0.0.1 123-45-6789 555-010-1234"
    once = _one(spark, s)
    assert _one(spark, once) == once


def test_vocab_topk_total_order_and_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Apple apple BANANA"),   # apple tf=2 here (case-folded)
         (2, "apple  cherry"),        # double space collapses
         (3, "banana cherry date"),
         (4, None), (5, "")],
        "doc_id long, text string")
    got = [tuple(r) for r in vocab_topk(df, "text", "doc_id", k=3).collect()]
    # apple tf=3 df=2; banana tf=2 df=2; cherry tf=2 df=2 (tie with
    # banana broken by word asc)
    assert got == [("apple", 3, 2), ("banana", 2, 2), ("cherry", 2, 2)]


def test_vocab_topk_limit_is_cut_after_order(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 4}") for i in range(40)], "doc_id long, text string")
    got = [r.word for r in vocab_topk(df, "text", "doc_id", k=2).collect()]
    assert got == ["w0", "w1"]
