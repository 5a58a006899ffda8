"""End-to-end image-corpus curation plan — the image-axis twin of
:mod:`~sparkschema.plans.curation_run`, composed from this engine's image
operators in the order a real 10^12-image pipeline runs them
(LAION/DataComp shape):

``null bytes → container structural gate → metadata quality gates
(dims / aspect / bytes-per-pixel / caption) → exact byte dedup →
decodability → pHash near-dup → caption boilerplate cap → split``

The reference project validates JSON structure only; this plan is part
of the training-data-pipeline mandate layered onto the same engine over
the BASELINE.json input_hint table ``(image_id, bytes, w, h, fmt,
caption, phash)``, composing :mod:`~sparkschema.operators.imagemeta`,
:mod:`~sparkschema.operators.imagequality`,
:mod:`~sparkschema.operators.imagedup` and
:mod:`~sparkschema.operators.sampling`.

Design for 10^12 rows — flags, not sequential filters (same contract as
``curate_corpus``):

- Every drop decision is a BOOLEAN COLUMN on one flagged frame; a single
  precedence ``CASE`` assigns each image its first failing stage
  (``drop_stage``), so the full attribution report is ONE aggregate.
- Cheap-first ordering is load-bearing: the structural and metadata
  gates are whole-stage-codegen byte/column checks fused into the scan
  (zero decode, zero shuffle) and the exact-dup hash aggregate shuffles
  32-byte digests, never bytes — so the ONLY stage that pays an Arrow
  decode (pHash) runs over the survivors of everything cheaper. On a
  corpus where gates drop 30-50% (typical crawl), that is the decode
  bill cut by the same fraction.
- ``phash_sigs`` accepts a precomputed/persisted ``(id, phash)``
  signature table — the materialize-once shape a production pipeline
  uses (signatures are 8 bytes/image, written next to the corpus and
  reused across runs); without it the plan decodes survivors in place.
- The id-keyed flag joins all share one key; clusters should bucket the
  corpus by ``id_col`` (see ``sources.tables``) to co-locate them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: drop stages in precedence order (an image failing several is
#: attributed to the FIRST — the order the sequential pipeline would
#: have dropped it in)
STAGES = ("null_bytes", "structural", "dims", "aspect", "bpp", "caption",
          "exact_dup", "undecodable", "near_dup", "caption_cap")


@dataclass
class ImageCurationResult:
    curated: DataFrame           # survivors: input columns (+ split)
    flagged: DataFrame           # every input row with drop_stage (NULL=kept)
    report: DataFrame            # one row: n_input, n_<stage>..., n_kept
    phash_sigs: DataFrame | None  # the signature frame the near-dup stage
    #                              used (persist/export it for reuse), or
    #                              None when the stage is off


def curate_images(df: DataFrame, *,
                  id_col: str = "image_id",
                  bytes_col: str = "bytes",
                  w_col: str = "w", h_col: str = "h",
                  fmt_col: str = "fmt", caption_col: str = "caption",
                  structural: bool = True,
                  quality: bool = True,
                  min_dim: int = 64, max_pixels: int = 16_777_216,
                  max_aspect: float = 4.0,
                  min_bpp: float = 0.05, max_bpp: float = 16.0,
                  min_caption_chars: int = 8, min_caption_tokens: int = 2,
                  min_printable_ratio: float = 0.9,
                  exact: bool = True,
                  phash_near_dup: bool = False,
                  phash_sigs: DataFrame | None = None,
                  chunks: int = 8, hamming_max: int = 10,
                  max_bucket: int | None = None,
                  caption_cap: int | None = None,
                  split_weights: dict[str, float] | None = None,
                  salt: str = "",
                  scope=None) -> ImageCurationResult:
    """Run the image curation pipeline; stages are opt-in via arguments.

    Stage semantics (each delegates to the already-tested operator):

    - ``null_bytes``: rows with NULL ``bytes_col`` — always on (nothing
      downstream is defined on an absent payload).
    - ``structural``: container header / dims / fmt / length agreement
      (:func:`~sparkschema.operators.imagemeta.container_meta_frame`
      ``meta_ok``) — the pre-decode byte gate.
    - ``dims``/``aspect``/``bpp``/``caption``: the metadata quality
      gates (:func:`~sparkschema.operators.imagequality.
      image_quality_frame`), attributed per gate in its documented
      precedence.
    - ``exact``: exact byte dedup — ``sha2(bytes, 256)`` groups over the
      gate survivors, minimum id wins; digests shuffle, bytes never do.
    - ``undecodable``: survivor whose pHash is NULL (structurally sound
      container but the payload fails decode, e.g. corrupt compressed
      body). Only evaluated when ``phash_near_dup`` is on.
    - ``phash_near_dup``: chunk-pigeonhole Hamming pairs over the 64-bit
      pHash (:func:`~sparkschema.operators.imagedup.image_phash_frame` /
      :func:`~sparkschema.operators.dedup.hamming_pairs`) resolved to
      clusters by min-label propagation; each cluster's minimum
      reachable id survives. Pass ``phash_sigs`` (``(id, phash)``) to
      reuse persisted signatures — survivors missing from the table
      (ingested after it was materialized) are decoded in place, so a
      stale table costs a decode of the new rows, never a wrong drop;
      without the argument all survivors are decoded here.
    - ``caption_cap``: keep at most k images per NORMALIZED caption
      (boilerplate "stock photo" captions), deterministic md5 priority
      (:func:`~sparkschema.operators.sampling.cap_per_group`); NULL /
      empty-after-normalization captions are exempt (the caption gate
      owns emptiness).
    - ``split_weights``: deterministic ``split`` column on survivors
      (:func:`~sparkschema.operators.sampling.hash_split`).

    ``id_col`` values must be non-NULL and unique (the stable-id
    contract of the dedup/sampling family). Returns
    :class:`ImageCurationResult`; ``report`` has the fixed schema
    ``(n_input, n_null_bytes, n_structural, n_dims, n_aspect, n_bpp,
    n_caption, n_exact_dup, n_undecodable, n_near_dup, n_caption_cap,
    n_kept)`` (disabled stages report 0).
    """
    from sparkschema.operators.caching import default_scope
    from sparkschema.operators.imagequality import image_quality_frame

    cache_scope = scope if scope is not None else default_scope()
    did, b = F.col(id_col), F.col(bytes_col)

    # --- row-local gates (one codegen'd projection, zero decode) ------
    if structural:
        from sparkschema.operators.imagemeta import container_meta_frame
        meta_ok = container_meta_frame(
            df, bytes_col=bytes_col, w_col=w_col, h_col=h_col,
            fmt_col=fmt_col).select(
                *df.columns, F.col("meta_ok").alias("__meta_ok"))
    else:
        meta_ok = df.withColumn("__meta_ok", F.lit(True))

    if quality:
        gates = image_quality_frame(
            meta_ok, w_col=w_col, h_col=h_col, caption_col=caption_col,
            bytes_col=bytes_col, min_dim=min_dim, max_pixels=max_pixels,
            max_aspect=max_aspect, min_bpp=min_bpp, max_bpp=max_bpp,
            min_caption_chars=min_caption_chars,
            min_caption_tokens=min_caption_tokens,
            min_printable_ratio=min_printable_ratio) \
            .drop("drop_reason", "keep")
    else:
        gates = meta_ok
        for g in ("dims_ok", "aspect_ok", "bpp_ok", "caption_ok"):
            gates = gates.withColumn(g, F.lit(True))

    pre = (F.when(b.isNull(), "null_bytes")
            .when(~F.col("__meta_ok"), "structural")
            .when(~F.col("dims_ok"), "dims")
            .when(~F.col("aspect_ok"), "aspect")
            .when(~F.col("bpp_ok"), "bpp")
            .when(~F.col("caption_ok"), "caption"))

    # --- ONE byte-scan: slim per-image flag frame ----------------------
    # The gate verdict, the exact-dedup digest (gate survivors only —
    # CaseWhen keeps sha2 off dropped rows) and the caption-cap group
    # key are all computed in a single projection over the byte corpus
    # and persisted as a NARROW frame (id + stage + two hashes). The old
    # shape re-ran the gate expressions AND re-read the byte column for
    # the winners aggregate, the cap candidate set and the report
    # aggregate — four byte-corpus scans where two suffice (this one and
    # the opt-in pHash decode of survivors below; guide §1.2/§2.3). At
    # 10^12 images the frame is ids+hashes (no payload), the same
    # asymptotic class as the id-only side tables it replaces.
    slim_cols = [did, pre.alias("__pre")]
    if exact:
        slim_cols.append(F.when(pre.isNull(), F.sha2(b, 256)).alias("__h"))
    if caption_cap is not None:
        from sparkschema.operators.dedup import normalized_text
        ncap = normalized_text(F.col(caption_col))
        slim_cols.append(
            F.when(F.col(caption_col).isNotNull() & (F.length(ncap) > 0),
                   F.sha2(ncap, 256)).alias("__g"))
    slim = cache_scope.persist(gates.select(*slim_cols))

    # --- exact byte dedup over gate survivors --------------------------
    # every id-only side table below is scope-persisted: each is tiny
    # (ids + a bool / an 8-byte hash), but its LINEAGE contains the full
    # byte scan, the digest aggregation, or the Arrow decode — without
    # the persist, every downstream action (und, components, cap,
    # report) re-executes that heavy upstream; measured 174 s -> ~20 s
    # on the 20k-image bench corpus
    flagged = slim
    if exact:
        winners = cache_scope.persist(
            slim.where(F.col("__pre").isNull())
                .groupBy(F.col("__h"))
                .agg(F.min(did).alias(id_col))
                .select(id_col, F.lit(True).alias("__keep_exact")))
        flagged = flagged.join(winners, on=id_col, how="left")
        flagged = flagged.withColumn(
            "__stage", F.coalesce(
                F.col("__pre"),
                F.when(~F.coalesce(F.col("__keep_exact"), F.lit(False)),
                       "exact_dup"))).drop("__keep_exact")
    else:
        flagged = flagged.withColumn("__stage", F.col("__pre"))
    flagged = flagged.drop("__pre")

    # --- pHash near-dup over survivors (the only decode) ---------------
    sigs_used = None
    if phash_near_dup:
        from sparkschema.operators.dedup import (hamming_pairs,
                                                 near_dup_components)
        from sparkschema.operators.imagedup import image_phash_frame
        # the decode pass re-reads bytes for SURVIVOR ids only: a
        # semi-join against the slim frame's alive ids ships ids, and
        # the byte scan reads just (id, bytes) — no gate re-evaluation
        alive_ids = flagged.where(F.col("__stage").isNull()) \
                           .select(id_col)
        alive = df.select(did, b).join(alive_ids, on=id_col,
                                       how="left_semi")
        if phash_sigs is not None:
            provided = phash_sigs.select(F.col(phash_sigs.columns[0])
                                         .alias("id"), "phash")
            # survivors ABSENT from the reused table were never decoded
            # (images ingested after the table was materialized) — decode
            # exactly those in place; a bare left join classified every
            # missing id 'undecodable' and silently dropped perfectly
            # decodable images (review find r5). The anti-join ships ids
            # only; the decode pays for just the truly-new rows, which is
            # the incremental bill the materialize-once shape promises.
            fresh = image_phash_frame(
                alive.join(provided.select(F.col("id").alias(id_col)),
                           on=id_col, how="left_anti"),
                bytes_col=bytes_col, id_col=id_col)
            sigs_used = provided.unionByName(fresh)
        else:
            sigs_used = image_phash_frame(alive, bytes_col=bytes_col,
                                          id_col=id_col)
        alive_sigs = cache_scope.persist(
            alive.select(did.alias("id"))
                 .join(sigs_used, on="id", how="left"))
        und = (alive_sigs.where(F.col("phash").isNull())
               .select(F.col("id").alias(id_col),
                       F.lit(True).alias("__und")))
        flagged = (flagged.join(und, on=id_col, how="left")
                   .withColumn("__stage", F.coalesce(
                       F.col("__stage"),
                       F.when(F.coalesce(F.col("__und"), F.lit(False)),
                              "undecodable"))).drop("__und"))
        pairs = hamming_pairs(
            alive_sigs.where(F.col("phash").isNotNull()),
            hash_col="phash", id_col="id", chunks=chunks,
            hamming_max=hamming_max, max_bucket=max_bucket)
        comps = near_dup_components(pairs, scope=cache_scope)
        nd_drop = (comps.where(F.col("id") != F.col("component"))
                   .select(F.col("id").alias(id_col),
                           F.lit(True).alias("__nd")))
        flagged = (flagged.join(nd_drop, on=id_col, how="left")
                   .withColumn("__stage", F.coalesce(
                       F.col("__stage"),
                       F.when(F.coalesce(F.col("__nd"), F.lit(False)),
                              "near_dup"))).drop("__nd"))

    # --- caption boilerplate cap over survivors-so-far -----------------
    if caption_cap is not None:
        from sparkschema.operators.sampling import cap_per_group
        # __g is the precomputed slim-frame group key: non-NULL exactly
        # for rows whose caption is non-NULL and non-empty after
        # normalization — the old candidate predicate, without touching
        # the caption column again
        capped = cache_scope.persist(
            flagged.where(F.col("__stage").isNull()
                          & F.col("__g").isNotNull())
                   .select(did.alias(id_col), F.col("__g")))
        keep = (cap_per_group(capped, "__g", id_col, caption_cap, salt=salt)
                .select(id_col, F.lit(True).alias("__cap_keep")))
        # exempt rows (NULL/empty caption) never entered `capped`;
        # left-joining `capped` marks the cap's candidate set so the
        # CASE below only evicts candidates that lost the rank
        cand = capped.select(id_col, F.lit(True).alias("__cap_cand"))
        flagged = (flagged.join(cand, on=id_col, how="left")
                   .join(keep, on=id_col, how="left")
                   .withColumn("__stage", F.coalesce(
                       F.col("__stage"),
                       F.when(F.coalesce(F.col("__cap_cand"), F.lit(False))
                              & ~F.coalesce(F.col("__cap_keep"),
                                            F.lit(False)),
                              "caption_cap")))
                   .drop("__cap_cand", "__cap_keep"))

    # per-image drop stage, id-keyed (ids unique by contract): the
    # report aggregates the slim stage table — no byte column in its
    # lineage — and the full-width `flagged` re-attaches the input
    # columns with one id join
    stage_table = flagged.select(id_col,
                                 F.col("__stage").alias("drop_stage"))
    flagged = df.join(stage_table, on=id_col, how="left") \
                .select(*df.columns, "drop_stage")

    report = stage_table.agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        *[F.sum(F.when(F.col("drop_stage") == s, 1).otherwise(0))
           .cast("long").alias(f"n_{s}") for s in STAGES],
        F.sum(F.when(F.col("drop_stage").isNull(), 1).otherwise(0))
         .cast("long").alias("n_kept"))

    curated = flagged.where(F.col("drop_stage").isNull()).drop("drop_stage")
    if split_weights is not None:
        from sparkschema.operators.sampling import hash_split
        curated = hash_split(curated, id_col, split_weights, salt=salt)

    return ImageCurationResult(curated=curated, flagged=flagged,
                               report=report, phash_sigs=sigs_used)
