"""Image-corpus quality gates — pure Catalyst, zero decode, zero shuffle.

The standard pre-training image-filter battery (LAION/DataComp-style)
re-expressed as whole-stage-codegen column predicates over the
input_hint table ``(image_id, bytes, w, h, fmt, caption, phash)``:

- **dims**: both sides ≥ ``min_dim``; total pixels ≤ ``max_pixels``
  (tiny thumbnails and decompression bombs out at scan speed),
- **aspect**: max(w,h)/min(w,h) ≤ ``max_aspect`` (banner/sliver art),
- **bpp**: bytes-per-pixel plausibility band when a byte column is
  present — a 4 KB "4096×4096 png" is a lie worth catching BEFORE the
  Arrow decode pays for it,
- **caption**: non-NULL, ≥ ``min_caption_chars`` after trim, ≥
  ``min_caption_tokens`` whitespace tokens, and mostly printable
  (non-control ratio ≥ 0.9).

Each gate is independent; ``drop_reason`` reports the FIRST failing gate
in the documented precedence (dims → aspect → bpp → caption) so stage
attribution sums to the drop count — same contract as
``plans/curation_run.curate_corpus``. At 10^12 rows this is a single
projection fused into the scan: no Python, no exchange, and with
``bytes_col=None`` Catalyst never reads the byte column at all
(ReadSchema pruning).

Reference parity: these are the image-table analogs of the scalar
keyword gates (minimum/maximum: NumberConstraints, minLength:
StringValidators.scala) applied to the container columns instead of
JSON scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ONE control-character set for the whole engine: the caption
# printable-ratio gate must agree character-for-character with the text
# scrub (and with the DuckDB twin strings) — a second hand-maintained
# copy here silently desynchronized on the next edit (review find r5).
# _CONTROL_CHARS is the explicit-char twin of _CONTROL_CLASS (defined
# side by side in normalize.py): translate deletes exactly the class's
# code points, so the count is bit-identical to the regexp_replace form
# without the per-row Matcher (guide §1.2 — measured ~20% cheaper over
# the 20M-caption bench table).
from sparkschema.operators.normalize import _CONTROL_CHARS as _CTRL_CHARS
from sparkschema.operators.normalize import _CONTROL_CLASS as _CTRL_CLASS

# Java \s — the exact whitespace set regexp_count('\s+') runs on; used
# by the token fast path below, which must agree with it char-for-char
_JAVA_WS_CHARS = " \t\n\x0b\f\r"


def caption_printable_ratio(caption: Column) -> Column:
    """Fraction of characters that are not control characters.

    Empty captions score 1.0 (the length gates own emptiness); NULL
    propagates."""
    n = F.length(caption)
    ctrl = n - F.length(F.translate(caption, _CTRL_CHARS, ""))
    return F.when(n == 0, F.lit(1.0)).otherwise(
        1.0 - ctrl.cast("double") / n.cast("double"))


def image_quality_frame(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    caption_col: str = "caption",
    bytes_col: str | None = "bytes",
    min_dim: int = 64,
    max_pixels: int = 16_777_216,
    max_aspect: float = 4.0,
    min_bpp: float = 0.05,
    max_bpp: float = 16.0,
    min_caption_chars: int = 8,
    min_caption_tokens: int = 2,
    min_printable_ratio: float = 0.9,
) -> DataFrame:
    """Append per-gate booleans + ``drop_reason`` + ``keep`` to ``df``.

    NULL ``w``/``h`` fails the dims gate (an image row without dims is
    unusable); NULL ``bytes`` passes the bpp gate (byte presence is the
    ``required`` keyword's business upstream — this gate only judges
    bytes that exist); NULL caption fails the caption gate.
    """
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    dims_ok = F.coalesce(
        (w >= min_dim) & (h >= min_dim) & (w * h <= max_pixels),
        F.lit(False))
    # try_divide, not /: under ANSI (Spark 4 default) a single zero-dim
    # row would crash the WHOLE gate job with DIVIDE_BY_ZERO — found by
    # the hostile differential fuzz. NULL ratios then take each gate's
    # documented NULL default (aspect: fail, bpp: pass), which is also
    # exactly DuckDB's float-division-by-zero semantics, keeping the
    # oracle twin engine-independent row by row.
    aspect = F.try_divide(F.greatest(w, h).cast("double"),
                          F.least(w, h).cast("double"))
    aspect_ok = F.coalesce(aspect <= max_aspect, F.lit(False))

    if bytes_col is not None:
        bpp = F.try_divide(F.octet_length(F.col(bytes_col)).cast("double"),
                           (w * h).cast("double"))
        bpp_ok = F.coalesce((bpp >= min_bpp) & (bpp <= max_bpp), F.lit(True))
    else:
        bpp_ok = F.lit(True)

    cap = F.col(caption_col)
    cap_trim = F.trim(cap)
    # tokens = whitespace-run count + 1, the exact size of
    # split(cap_trim, "\s+") for ANY string (split always yields
    # count+1 fields, including the empty-after-trim single empty
    # token) — one regex pass, no token array materialized. Threshold-
    # aware fast paths (r6, guide §1.2): ≤1 required tokens is
    # statically true (any string has ≥1 token); exactly 2 is "contains
    # any Java-\s char" — a lazy OR of byte searches that exits at the
    # first space instead of regexp-counting every run (the bench
    # table's captions hit the first alternative ~always; measured
    # ~1.1 s → ~0.1 s over 20M captions). k>2 keeps the counting form.
    # All three forms have identical truth tables (NULL included).
    if min_caption_tokens <= 1:
        tok_ok = F.when(cap_trim.isNull(), F.lit(None).cast("boolean")) \
                  .otherwise(F.lit(True))
    elif min_caption_tokens == 2:
        tok_ok = cap_trim.contains(" ")
        for ch in _JAVA_WS_CHARS[1:]:
            tok_ok = tok_ok | cap_trim.contains(ch)
    else:
        tok_n = F.regexp_count(cap_trim, F.lit("\\s+")) + 1
        tok_ok = tok_n >= min_caption_tokens
    # printable-ratio fast path: rows with NO control char have ratio
    # exactly 1.0, so when the threshold is ≤1.0 a single regex find
    # (early exit at the first control char) settles them without the
    # per-codepoint translate count; only dirty rows fall through to
    # the exact ratio. _CTRL_CLASS is the regex twin of the translate
    # char set (single source in normalize.py, drift-guarded by test).
    ratio_cmp = caption_printable_ratio(cap) >= min_printable_ratio
    if min_printable_ratio <= 1.0:
        printable_ok = F.when(~cap.rlike(_CTRL_CLASS), F.lit(True)) \
                        .otherwise(ratio_cmp)
    else:
        printable_ok = ratio_cmp
    caption_ok = F.coalesce(
        (F.length(cap_trim) >= min_caption_chars)
        & tok_ok & printable_ok,
        F.lit(False))

    drop_reason = (
        F.when(~dims_ok, "dims")
         .when(~aspect_ok, "aspect")
         .when(~bpp_ok, "bpp")
         .when(~caption_ok, "caption")
         .otherwise(F.lit(None).cast("string")))
    return (df.withColumn("dims_ok", dims_ok)
              .withColumn("aspect_ok", aspect_ok)
              .withColumn("bpp_ok", bpp_ok)
              .withColumn("caption_ok", caption_ok)
              .withColumn("drop_reason", drop_reason)
              .withColumn("keep", drop_reason.isNull()))


def image_quality_report(df: DataFrame, **kwargs) -> DataFrame:
    """One-row attribution report: total, kept, and per-reason drops.

    Precedence-attributed (each dropped row counts once, under its FIRST
    failing gate) so ``kept + dims + aspect + bpp + caption == total`` —
    one aggregate pass, no per-stage count() jobs."""
    f = image_quality_frame(df, **kwargs)

    def n(reason: str) -> Column:
        return F.coalesce(
            F.sum((F.col("drop_reason") == reason).cast("long")), F.lit(0))

    return f.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0)).alias("kept"),
        n("dims").alias("drop_dims"),
        n("aspect").alias("drop_aspect"),
        n("bpp").alias("drop_bpp"),
        n("caption").alias("drop_caption"),
    )


def duplicate_caption_groups(df: DataFrame, caption_col: str = "caption",
                             id_col: str = "image_id",
                             min_group: int = 2) -> DataFrame:
    """Boilerplate-caption detection: the same caption attached to many
    DISTINCT images ("stock photo", SEO spam, scraper placeholders) is a
    strong curation signal even when every image is unique.

    Returns ``(caption_hash, n_rows, n_images, min_id)`` for normalized
    captions appearing ≥ ``min_group`` times. One map-side-combined hash
    aggregation on a 32-byte key — captions themselves never shuffle.
    NULL / empty-after-trim captions are excluded (they are the caption
    quality gate's business, not duplication). Normalization is the
    engine-canonical ``dedup.normalized_text`` (lower → collapse
    whitespace → ASCII-space trim), so dedup keys agree across text and
    caption operators and the DuckDB ``_NORM`` twin replays it exactly.
    """
    from sparkschema.operators.dedup import normalized_text

    cap = normalized_text(F.col(caption_col))
    return (
        df.where(F.col(caption_col).isNotNull() & (F.length(cap) > 0))
          .select(F.sha2(cap, 256).alias("caption_hash"), F.col(id_col))
          .groupBy("caption_hash")
          .agg(F.count(F.lit(1)).alias("n_rows"),
               F.count_distinct(F.col(id_col)).alias("n_images"),
               F.min(id_col).alias("min_id"))
          .where(F.col("n_rows") >= min_group)
    )


# Constant-area training-bucket ladder (the ~1 MPx set used by
# aspect-bucketed image-model training); override per training recipe.
ASPECT_BUCKETS: list[tuple[int, int]] = [
    (512, 2048), (640, 1536), (768, 1344), (896, 1152), (1024, 1024),
    (1152, 896), (1344, 768), (1536, 640), (2048, 512),
]


def _checked_buckets(buckets) -> list[tuple[int, int]]:
    bk = [(int(bw), int(bh))
          for bw, bh in (ASPECT_BUCKETS if buckets is None else buckets)]
    if not bk or any(bw <= 0 or bh <= 0 for bw, bh in bk):
        raise ValueError("aspect buckets must be positive (w, h) pairs")
    if any(bw > 2**31 - 1 or bh > 2**31 - 1 for bw, bh in bk):
        # keeps every decimal(38,0) product below 10^38 for int32 dims
        raise ValueError("aspect bucket sides must fit int32")
    # strictly increasing ratios make the boundary rule well-defined;
    # compare as exact cross products, never floats
    for (aw, ah), (bw, bh) in zip(bk, bk[1:]):
        if aw * bh >= bw * ah:
            raise ValueError(
                "aspect buckets must be sorted by strictly increasing w/h")
    return bk


def aspect_bucket_assign(df: DataFrame,
                         buckets: list[tuple[int, int]] | None = None,
                         w_col: str = "w", h_col: str = "h") -> DataFrame:
    """Assign each image to its nearest aspect-ratio training bucket.

    Appends ``(bucket_id, bucket_w, bucket_h)``. "Nearest" is in
    log-ratio space (the symmetric notion: a 2:1 image is as far from
    1:1 as a 1:2 image), but the comparison is evaluated EXACTLY in
    int64 — no ``ln`` in the plan, so the assignment can never flip
    between engines or platforms on a float ulp. With buckets sorted by
    ratio, nearest-in-log-ratio is equivalent to counting the geometric
    midpoints the image ratio exceeds::

        |ln r - ln b_j| > |ln r - ln b_{j+1}|   iff   r^2 > b_j * b_{j+1}
        r^2 > b_j*b_{j+1}   iff   w^2 * bh_j*bh_{j+1} > h^2 * bw_j*bw_{j+1}

    so ``bucket_id = sum_j [w^2*BH_j > h^2*BW_j]`` over the k-1 adjacent
    products — a fixed-size sum of codegen'd integer comparisons fused
    into the scan. Dims at or below the ladder-derived safe bound
    (``isqrt(int64_max / max_boundary_product)`` — ~1.7 M px for the
    default ladder, i.e. every real image) take the int64 fast tier;
    larger dims take an exact ``decimal(38,0)`` tier instead of ANSI
    ARITHMETIC_OVERFLOW crashing the job (CaseWhen branches evaluate
    lazily, so the fast tier never touches the oversized rows). Both
    tiers are the same exact arithmetic: for any int32 dims and int32
    bucket sides the products stay ≤ ~2.1e37 < 10^38. Exact boundary
    ties take the LOWER bucket on every engine (strict >). NULL,
    non-positive, or beyond-int32 dims get NULL bucket columns — dims
    validity is the dims gate's business upstream (input_hint declares
    ``w:int32, h:int32``).

    At 10^12 rows: this is a projection (zero exchange, zero Python);
    follow with ``df.repartition("bucket_id")`` to co-locate each bucket
    for shard writing, and the per-bucket row counts from
    :func:`aspect_bucket_report` size that repartition. Reference
    parity: the nearest-member assignment is the image-table analog of
    the reference's enum membership over a closed literal set
    (AnyConstraintValidators.scala enum), graded instead of boolean.
    """
    import math

    bk = _checked_buckets(buckets)
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    valid = (w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
             & (w <= 2**31 - 1) & (h <= 2**31 - 1))
    maxprod = max((max(ah * bh, aw * bw)
                   for (aw, ah), (bw, bh) in zip(bk, bk[1:])), default=1)
    safe = math.isqrt((2**63 - 1) // maxprod)
    wd = F.col(w_col).cast("decimal(19,0)")
    hd = F.col(h_col).cast("decimal(19,0)")
    fast = F.lit(0)
    wide = F.lit(0)
    for (aw, ah), (bw, bh) in zip(bk, bk[1:]):
        fast = fast + (
            (w * w * F.lit(ah * bh)) > (h * h * F.lit(aw * bw))
        ).cast("int")
        wide = wide + (
            (wd * wd * F.lit(ah * bh)) > (hd * hd * F.lit(aw * bw))
        ).cast("int")
    bucket_id = (F.when(valid & (w <= safe) & (h <= safe), fast)
                  .when(valid, wide)
                  .otherwise(F.lit(None).cast("int")))
    ws = F.array(*[F.lit(bw) for bw, _ in bk])
    hs = F.array(*[F.lit(bh) for _, bh in bk])
    return (df.withColumn("bucket_id", bucket_id)
              .withColumn("bucket_w", F.get(ws, F.col("bucket_id")))
              .withColumn("bucket_h", F.get(hs, F.col("bucket_id"))))


def aspect_bucket_report(df: DataFrame,
                         buckets: list[tuple[int, int]] | None = None,
                         w_col: str = "w", h_col: str = "h") -> DataFrame:
    """Per-bucket occupancy: ``(bucket_id, bucket_w, bucket_h, n_images,
    n_exact_fit)`` — one map-side-combined aggregation over at most
    k+1 groups (invalid-dims rows surface as the NULL-bucket row rather
    than vanishing). ``n_exact_fit`` counts images already exactly at
    the bucket ratio (``w*bucket_h == h*bucket_w``, exact decimal cross
    products — overflow-proof for any int32 dims × int32 sides) — the
    rows a bucketed resize would not distort. All-integer output, so
    differential twins hash bit-for-bit."""
    a = aspect_bucket_assign(df, buckets, w_col=w_col, h_col=h_col)
    w = F.col(w_col).cast("decimal(19,0)")
    h = F.col(h_col).cast("decimal(19,0)")
    fit = (w * F.col("bucket_h").cast("decimal(19,0)")
           == h * F.col("bucket_w").cast("decimal(19,0)")).cast("long")
    return (a.groupBy("bucket_id", "bucket_w", "bucket_h")
             .agg(F.count(F.lit(1)).alias("n_images"),
                  F.coalesce(F.sum(fit), F.lit(0)).alias("n_exact_fit")))
