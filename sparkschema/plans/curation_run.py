"""End-to-end training-corpus curation plan — the standard LLM data
pipeline composed from this engine's operators, in the order real
pipelines run them (C4/RefinedWeb/Dolma shape):

``NULL gate → exact dedup → near-dup dedup → language filter → quality
threshold → token floor → benchmark decontamination → per-source cap →
split assignment → (optional) line scrub + PII redaction``

The reference project validates structure only; this plan is part of the
training-data-pipeline mandate layered onto the same engine, composing
:mod:`~sparkschema.operators.dedup`, :mod:`~sparkschema.operators.text`,
:mod:`~sparkschema.operators.pii` and
:mod:`~sparkschema.operators.sampling`.

Design for 10^12 rows — flags, not sequential filters:

- Every drop decision becomes a BOOLEAN COLUMN on one flagged frame;
  a single precedence ``CASE`` assigns each document its first failing
  stage (``drop_stage``), so the full attribution report is ONE
  aggregate over one pass instead of a ``count()`` materialization per
  stage (ten actions → one).
- Row-local stages (language, quality, tokens) are pure Column
  expressions fused into the scan by whole-stage codegen. Join-shaped
  stages add exactly the exchanges their algorithm needs: exact dedup
  one map-side-combined hash agg + one id-keyed join; decontamination a
  broadcast join (the eval-set gram side is small by construction);
  the source cap one exchange on the source key.
- Order-dependent stages (near-dup, cap) are conditioned on the
  survivors of earlier stages — near-dup signatures are never computed
  for documents exact-dedup already dropped, and the per-source cap
  ranks only documents that will actually ship.
- The id-keyed joins all share one key: repartitioning the corpus by
  ``id_col`` once upstream co-locates every flag join (callers on real
  clusters should bucket by id; see ``sources.tables``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: drop stages in precedence order (a document failing several is
#: attributed to the FIRST — the order the pipeline would have dropped
#: it in if run as sequential filters)
STAGES = ("null_text", "exact_dup", "near_dup", "language", "quality",
          "min_tokens", "contaminated", "source_cap")


@dataclass
class CurationResult:
    curated: DataFrame   # survivors: id, (scrubbed/redacted) text, split
    flagged: DataFrame   # every input doc with its drop_stage (NULL=kept)
    report: DataFrame    # one row: n_input, n_<stage>..., n_kept


def curate_corpus(df: DataFrame, text_col: str, id_col: str, *,
                  languages: list[str] | None = None,
                  min_quality: float | None = None,
                  min_tokens: int | None = None,
                  exact: bool = True,
                  near_dup: bool = False,
                  eval_df: DataFrame | None = None,
                  eval_text_col: str | None = None,
                  contamination_n: int = 8,
                  per_source_cap: int | None = None,
                  source_col: str | None = None,
                  split_weights: dict[str, float] | None = None,
                  salt: str = "",
                  line_scrub: bool = False,
                  redact: bool = False,
                  scope=None) -> CurationResult:
    """Run the curation pipeline; every stage is opt-in via its argument.

    Stage semantics (each delegates to the already-oracled operator):

    - ``null_text``: documents with NULL ``text_col`` are dropped —
      always on (nothing downstream is defined on an absent document).
    - ``exact``: normalized-content exact dedup; the group's minimum id
      survives (:func:`~sparkschema.operators.dedup.exact_dedup` key).
    - ``near_dup``: MinHash-LSH pairs → connected components; each
      cluster's minimum reachable id survives
      (:func:`~sparkschema.operators.dedup.near_dup_components`).
      Computed only over documents surviving the earlier stages.
    - ``languages``: keep documents whose
      :func:`~sparkschema.operators.text.lang_id` is in the list.
    - ``min_quality``: threshold on
      :func:`~sparkschema.operators.text.quality_score`, compared at
      4-decimal resolution with the half-up tie-break the DuckDB twin
      uses (``floor(q·10⁴ + 0.5)/10⁴``) so a threshold landing on a
      rounding boundary cannot flip between engines.
    - ``min_tokens``: floor on
      :func:`~sparkschema.operators.text.token_count`.
    - ``eval_df``: drop documents sharing any word ``contamination_n``-
      gram with the eval set
      (:func:`~sparkschema.operators.text.contamination_flags`).
    - ``per_source_cap``: keep at most k documents per ``source_col``
      by deterministic md5 priority
      (:func:`~sparkschema.operators.sampling.cap_per_group` selection),
      ranked among documents surviving everything above.
    - ``split_weights``: add the deterministic ``split`` column
      (:func:`~sparkschema.operators.sampling.hash_split`).
    - ``line_scrub``: rewrite survivors' text through
      :func:`~sparkschema.operators.dedup.line_dedup` (first corpus
      occurrence of each non-empty line survives). Runs AFTER the drop
      stages: quality/tokens are scored on the document as crawled.
    - ``redact``: replace PII spans in the final text
      (:func:`~sparkschema.operators.pii.pii_redact`).

    ``id_col`` values must be non-NULL and unique (the stable-id
    contract shared by the dedup/sampling family).

    **Cache lifecycle:** the id-only flag tables (exact winners,
    contamination hits, near-dup drops, cap keepers) and the operators'
    signature frames persist into ``scope``; with ``scope=None`` they
    land in the process-wide default scope and stay pinned until
    ``release_default_cache()`` — long-lived sessions should pass their
    own :class:`~sparkschema.operators.caching.CacheScope` and release
    it when done with every returned frame.

    Returns :class:`CurationResult`; ``report`` has the fixed schema
    ``(n_input, n_null_text, n_exact_dup, n_near_dup, n_language,
    n_quality, n_min_tokens, n_contaminated, n_source_cap, n_kept)``
    (disabled stages report 0). ``flagged``/``curated`` stay lazy;
    ``report`` is one aggregate over ``flagged``.
    """
    from sparkschema.operators.caching import default_scope
    from sparkschema.operators.dedup import normalized_text
    from sparkschema.operators.text import lang_id, quality_score, token_count

    cache_scope = scope if scope is not None else default_scope()
    text, did = F.col(text_col), F.col(id_col)

    # --- ONE heavy text pass: slim per-doc flag frame -----------------
    # Every row-local signal (language, quality, token floor, NULL gate)
    # plus the exact-dedup content hash is computed in a single
    # projection over the corpus and persisted as a NARROW frame
    # (id [+ source] + 4 booleans + a 32-byte hash — no text). The old
    # shape re-ran lang_id/quality_score/token_count once for the cap's
    # survivor ranking and AGAIN for the report aggregate, and scanned
    # the corpus separately for the exact-dedup hash — at 50 k sf1.0
    # docs the quality expressions alone are ~1 s/pass (guide §1.2:
    # don't compute things twice). Downstream consumers (winners
    # aggregate, near-dup survivor set, cap ranking, report) all read
    # this frame; the corpus text is touched again only by the
    # contamination gram pass and the opt-in near-dup shingling, which
    # genuinely need it.
    lang_bad = (F.lit(False) if languages is None
                else ~lang_id(text).isin(list(languages)))
    if min_quality is not None:
        q4 = F.floor(quality_score(text) * 10000 + F.lit(0.5)) / 10000
        quality_bad = q4 < F.lit(float(min_quality))
    else:
        quality_bad = F.lit(False)
    tokens_bad = (F.lit(False) if min_tokens is None
                  else token_count(text) < F.lit(int(min_tokens)))

    slim_cols = [did, text.isNull().alias("__null"),
                 lang_bad.alias("__lang_bad"),
                 quality_bad.alias("__quality_bad"),
                 tokens_bad.alias("__tokens_bad")]
    if source_col is not None:
        slim_cols.insert(1, F.col(source_col))
    if exact:
        slim_cols.append(F.sha2(normalized_text(text), 256).alias("__h"))
    slim = cache_scope.persist(df.select(*slim_cols))

    # --- join-shaped flags -------------------------------------------
    # id-only side tables are scope-persisted: each is tiny, but its
    # lineage contains a corpus-scale scan/aggregation — unpersisted,
    # every downstream action (near-dup, cap, report, curated
    # consumers) re-executes that upstream (the 15x blowup the image
    # twin measured on its byte corpus; same class here)
    flagged = slim
    if exact:
        winners = cache_scope.persist(
            slim.where(~F.col("__null"))
                .groupBy("__h")
                .agg(F.min(did).alias(id_col))
                .select(id_col, F.lit(True).alias("__keep_exact")))
        flagged = flagged.join(winners, on=id_col, how="left")
    else:
        flagged = flagged.withColumn("__keep_exact", F.lit(True))

    if eval_df is not None:
        from sparkschema.operators.text import contamination_flags
        hits = cache_scope.persist(contamination_flags(
            df, text_col, id_col, eval_df,
            eval_text_col if eval_text_col is not None else text_col,
            n=contamination_n).select(id_col, F.lit(True).alias("__contam")))
        flagged = flagged.join(hits, on=id_col, how="left")
    else:
        flagged = flagged.withColumn("__contam", F.lit(False))

    pre = F.when(F.col("__null"), "null_text") \
           .when(~F.coalesce(F.col("__keep_exact"), F.lit(False)),
                 "exact_dup")
    flagged = flagged.withColumn("__pre", pre)

    # --- near-dup over exact-dedup survivors -------------------------
    if near_dup:
        from sparkschema.operators.dedup import (minhash_lsh_pairs,
                                                 near_dup_components)
        alive_ids = flagged.where(F.col("__pre").isNull()).select(id_col)
        alive = df.select(id_col, text_col) \
                  .join(alive_ids, on=id_col, how="left_semi")
        pairs = minhash_lsh_pairs(alive, text_col, id_col,
                                  scope=cache_scope)
        comps = near_dup_components(pairs, id_a="id_a", id_b="id_b",
                                    scope=cache_scope)
        nd_drop = cache_scope.persist(
            comps.where(F.col("id") != F.col("component"))
                 .select(F.col("id").alias(id_col),
                         F.lit(True).alias("__nd")))
        flagged = flagged.join(nd_drop, on=id_col, how="left")
    else:
        flagged = flagged.withColumn("__nd", F.lit(False))

    stage = F.coalesce(
        F.col("__pre"),
        F.when(F.coalesce(F.col("__nd"), F.lit(False)), "near_dup")
         .when(F.col("__lang_bad"), "language")
         .when(F.col("__quality_bad"), "quality")
         .when(F.col("__tokens_bad"), "min_tokens")
         .when(F.coalesce(F.col("__contam"), F.lit(False)), "contaminated"))
    flagged = flagged.withColumn("__stage", stage)

    # --- per-source cap, ranked among survivors-so-far ---------------
    if per_source_cap is not None:
        if source_col is None:
            raise ValueError("per_source_cap requires source_col")
        from sparkschema.operators.sampling import cap_per_group
        alive = flagged.where(F.col("__stage").isNull()) \
                       .select(id_col, source_col)
        keep = cache_scope.persist(
            cap_per_group(alive, source_col, id_col,
                          per_source_cap, salt=salt)
            .select(id_col, F.lit(True).alias("__cap_keep")))
        flagged = (flagged.join(keep, on=id_col, how="left")
                          .withColumn("__stage", F.coalesce(
                              F.col("__stage"),
                              F.when(~F.coalesce(F.col("__cap_keep"),
                                                 F.lit(False)),
                                     "source_cap"))))

    # per-doc drop stage, id-keyed (ids are unique by contract, so the
    # report aggregates over this frame are identical to aggregating
    # over the full rows, and the full-width `flagged` below re-attaches
    # the text columns with one id join)
    stage_table = flagged.select(id_col, F.col("__stage")
                                 .alias("drop_stage"))
    flagged = df.join(stage_table, on=id_col, how="left") \
                .select(*df.columns, "drop_stage")

    report = stage_table.agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        *[F.sum(F.when(F.col("drop_stage") == s, 1).otherwise(0))
           .cast("long").alias(f"n_{s}") for s in STAGES],
        F.sum(F.when(F.col("drop_stage").isNull(), 1).otherwise(0))
         .cast("long").alias("n_kept"))

    curated = flagged.where(F.col("drop_stage").isNull()).drop("drop_stage")
    if line_scrub:
        from sparkschema.operators.dedup import line_dedup
        scrubbed = (line_dedup(curated, text_col, id_col)
                    .select(id_col, F.col(text_col).alias("__scrubbed")))
        curated = (curated.join(scrubbed, on=id_col, how="left")
                          .withColumn(text_col, F.col("__scrubbed"))
                          .drop("__scrubbed"))
    if redact:
        from sparkschema.operators.pii import pii_redact
        curated = curated.withColumn(text_col, pii_redact(F.col(text_col)))
    if split_weights is not None:
        from sparkschema.operators.sampling import hash_split
        curated = hash_split(curated, id_col, split_weights, salt=salt)

    return CurationResult(curated=curated, flagged=flagged, report=report)
