"""End-to-end corpus-curation plan (plans/curation_run.py): stage
semantics, precedence attribution, report arithmetic, and the optional
near-dup / scrub / redact / split tails — on a planted corpus where
every stage has a known victim."""

import pytest
from pyspark.sql import functions as F

from sparkschema.plans.curation_run import STAGES, curate_corpus

GOOD = ("the quick brown fox jumps over the lazy dog and it was the "
        "best of times for all of the animals in the forest that day")
FR = ("le chat est dans la maison et il mange une pomme pour le "
      "plaisir des enfants qui jouent dans le jardin pres de la mer")
NEAR_A = GOOD + " extra trailing words for the near duplicate pair one"
NEAR_B = GOOD + " extra trailing words for the near duplicate pair two"


def _corpus(spark):
    rows = [
        (1, GOOD, "s1"),
        (2, GOOD.upper(), "s1"),          # normalized exact dup of 1
        (3, None, "s1"),                  # null_text
        (4, FR, "s1"),                    # language (en filter)
        # 'the' keeps lang=en; short + digits + caps + bangs sink the
        # quality score below 0.5 (length 0.15, words 0.2, stop 0.1,
        # penalty saturates) while 6 tokens clear the min_tokens floor
        (5, "THE 99999 88888!!!", "s1"),
        (6, "the and of", "s1"),          # quality ok, min_tokens fails
        (7, GOOD + " totally different tail so it is not a near dup of "
            "anything else here", "s1"),  # shares 8-grams with eval doc
    ]
    rows += [(i, f"completely fresh hot source document number {i} with "
                 f"plenty of the and of words so it stays english and "
                 f"clears every quality threshold {i}", "hot")
             for i in range(8, 13)]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")


def test_stage_attribution_and_report(spark):
    df = _corpus(spark)
    eval_df = spark.createDataFrame([(100, GOOD)], "eid long, text string")
    res = curate_corpus(
        df, "text", "doc_id",
        languages=["en"], min_quality=0.5, min_tokens=5,
        exact=True, eval_df=eval_df, eval_text_col="text",
        per_source_cap=2, source_col="source",
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1})

    stages = {r.doc_id: r.drop_stage for r in res.flagged.collect()}
    assert stages[2] == "exact_dup"
    assert stages[3] == "null_text"
    assert stages[4] == "language"
    assert stages[5] == "quality"
    assert stages[6] == "min_tokens"
    # docs 1 and 7 share 8-grams with the eval doc (GOOD itself); doc 1
    # is the exact-dup winner but still contaminated
    assert stages[1] == "contaminated"
    assert stages[7] == "contaminated"
    hot = [stages[i] for i in range(8, 13)]
    assert hot.count("source_cap") == 3 and hot.count(None) == 2

    rep = res.report.collect()[0].asDict()
    assert rep["n_input"] == 12
    assert rep["n_kept"] == 2
    assert rep["n_input"] == rep["n_kept"] + sum(
        rep[f"n_{s}"] for s in STAGES)
    assert rep["n_near_dup"] == 0       # stage disabled => 0, not absent

    kept = res.curated.collect()
    assert {r.doc_id for r in kept} == {i for i in range(8, 13)
                                        if stages[i] is None}
    assert all(r.split in ("train", "val", "test") for r in kept)


def test_precedence_exact_dup_beats_language(spark):
    # a document that is BOTH an exact dup and non-English is attributed
    # to exact_dup (first pipeline stage that would have dropped it)
    df = spark.createDataFrame(
        [(1, FR, "s"), (2, FR, "s")], "doc_id long, text string, source string")
    res = curate_corpus(df, "text", "doc_id", languages=["en"])
    stages = {r.doc_id: r.drop_stage for r in res.flagged.collect()}
    assert stages[1] == "language"      # winner survives dedup, fails lang
    assert stages[2] == "exact_dup"


def test_near_dup_stage_keeps_cluster_minimum(spark):
    df = spark.createDataFrame(
        [(1, NEAR_A), (2, NEAR_B), (3, FR)],
        "doc_id long, text string")
    res = curate_corpus(df, "text", "doc_id", near_dup=True)
    stages = {r.doc_id: r.drop_stage for r in res.flagged.collect()}
    assert stages[1] is None and stages[3] is None
    assert stages[2] == "near_dup"
    rep = res.report.collect()[0].asDict()
    assert (rep["n_near_dup"], rep["n_kept"]) == (1, 2)


def test_scrub_and_redact_rewrite_survivor_text(spark):
    df = spark.createDataFrame(
        [(1, "SHARED HEADER\nmail me at a@b.co today"),
         (2, "SHARED HEADER\nsomething else entirely here")],
        "doc_id long, text string")
    res = curate_corpus(df, "text", "doc_id", line_scrub=True, redact=True)
    texts = {r.doc_id: r.text for r in res.curated.collect()}
    assert texts[1] == "SHARED HEADER\nmail me at [EMAIL] today"
    assert texts[2] == "something else entirely here"   # header deduped


def test_curated_is_deterministic(spark):
    df = _corpus(spark)
    kw = dict(languages=["en"], min_quality=0.5, min_tokens=5,
              per_source_cap=2, source_col="source",
              split_weights={"train": 0.8, "val": 0.2})
    a = sorted(tuple(r) for r in
               curate_corpus(df, "text", "doc_id", **kw).curated.collect())
    b = sorted(tuple(r) for r in
               curate_corpus(df.repartition(7), "text", "doc_id",
                             **kw).curated.collect())
    assert a == b and len(a) > 0
