"""Approximate-nearest-neighbor similarity search over embedding columns.

- :func:`cosine_topk_bruteforce` — the exactness baseline: broadcast the
  query set, compute cosine with ``zip_with``/``aggregate`` HOFs (JVM
  codegen, no Python), rank with a window. Cost O(|Q|·|C|) — correct
  reference for recall measurement, usable when |Q| is small.
- :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH with
  multi-table banding; each query only scores candidates sharing a band
  bucket. Recall/latency tunes with (planes, tables).
- :func:`ivf_topk` — IVF-style: k-means-ish centroids picked
  deterministically (hash-sampled), vectors assigned to nearest centroid
  (one broadcast join + HOF argmin), queries probe ``nprobe`` nearest
  cells. No MLlib dependency; everything is DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns (pure HOF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def _valid_vec(col: Column) -> Column:
    """Non-NULL vector with no NULL elements — malformed embeddings are
    excluded from every ANN path (a NULL element crashed the IVF centroid
    materialization; NULL cosines otherwise rank as neighbors)."""
    return col.isNotNull() & ~F.exists(col, lambda x: x.isNull())


def cosine_topk_bruteforce(queries: DataFrame, corpus: DataFrame,
                           q_id: str, q_vec: str, c_id: str, c_vec: str,
                           k: int = 10) -> DataFrame:
    """Exact top-k: ``(query_id, neighbor_id, cosine, rank)``.

    The query side is broadcast — the corpus never shuffles; scoring is one
    codegen'd projection over the corpus scan per query batch."""
    # NULL vectors drop out up front: a NULL query otherwise "ranks" k
    # fabricated NULL-cosine neighbors (row_number ranks NULLs too), and
    # NULL corpus vectors can never be real neighbors (review find r4)
    q = F.broadcast(queries.where(_valid_vec(F.col(q_vec)))
                    .select(F.col(q_id).alias("query_id"),
                            F.col(q_vec).alias("__qv")))
    c = corpus.where(_valid_vec(F.col(c_vec))) \
              .select(F.col(c_id).alias("neighbor_id"),
                      F.col(c_vec).alias("__cv"))
    scored = q.crossJoin(c).select(
        "query_id", "neighbor_id",
        cosine_expr(F.col("__qv"), F.col("__cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def plane_matrix(planes: int, tables: int, dims: int,
                 seed: int = 42) -> list[list[list[float]]]:
    """Deterministic ±1 hyperplane matrix ``[table][plane][dim]`` from an
    md5 bit per (seed, table, plane, dim) — engine-independent, so a SQL
    oracle (DuckDB) can embed the SAME matrix as literals and recompute
    bucket assignments exactly at any data scale (the old xxhash64-based
    signs were Spark-only, forcing the oracle to pin a measured hit count
    valid at one SF)."""
    import hashlib

    def sgn(t: int, p: int, i: int) -> float:
        h = hashlib.md5(f"{seed}:{t}:{p}:{i}".encode()).digest()[0]
        return 1.0 if h & 1 else -1.0

    return [[[sgn(t, p, i) for i in range(dims)] for p in range(planes)]
            for t in range(tables)]


def _hyperplane_sig(v: Column, planes: int, table: int,
                    matrix: list[list[list[float]]]) -> Column:
    """Signature from the precomputed ±1 matrix: one array literal per
    plane (a single Literal node — never an F.array tree), dot via
    zip_with+aggregate, sign quantized at 1e-6 so summation-order
    rounding differences between engines can never flip a bucket bit."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        m = F.lit(matrix[table][p])
        s = F.aggregate(F.zip_with(v, m, lambda x, w: x * w),
                        F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(F.round(s, 6) >= 0, F.lit(1).cast("long")) \
                     .otherwise(F.lit(0).cast("long")) * (2 ** p)
    return sig


def ann_lsh_topk(queries: DataFrame, corpus: DataFrame,
                 q_id: str, q_vec: str, c_id: str, c_vec: str,
                 k: int = 10, planes: int = 10, tables: int = 4,
                 seed: int = 42) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Each table hashes every vector to a ``planes``-bit bucket; a query
    scores only corpus vectors sharing a bucket in ≥1 table. Returns
    ``(query_id, neighbor_id, cosine, rank)`` with rank ≤ k per query.

    The plane matrix is seed-derived driver-side (:func:`plane_matrix`);
    the one bounded collect reads a single NON-NULL vector to learn the
    dimensionality (uniform dims assumed — shorter/longer vectors
    zip-pad to NULL and land in bucket-bit 0)."""
    dims_row = corpus.where(F.col(c_vec).isNotNull()) \
                     .select(F.size(F.col(c_vec))).limit(1).collect()
    dims = int(dims_row[0][0]) if dims_row and dims_row[0][0] is not None \
        else 0
    matrix = plane_matrix(planes, tables, dims, seed)

    def with_buckets(df, id_alias, vec_alias, idc, vecc):
        arr = F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _hyperplane_sig(F.col(vecc), planes, t, matrix).alias("sig"))
            for t in range(tables)
        ])
        return (df.select(F.col(idc).alias(id_alias), F.col(vecc).alias(vec_alias),
                          F.explode(arr).alias("b"))
                  .select(id_alias, vec_alias, "b.tbl", "b.sig"))

    # NULL vectors: same rationale as the brute-force path (they would
    # also all land in one signature-0 bucket, inflating it)
    qb = with_buckets(queries.where(_valid_vec(F.col(q_vec))),
                      "query_id", "__qv", q_id, q_vec)
    cb = with_buckets(corpus.where(_valid_vec(F.col(c_vec))),
                      "neighbor_id", "__cv", c_id, c_vec)
    cand = (qb.join(cb, ["tbl", "sig"])
              .select("query_id", "neighbor_id", "__qv", "__cv")
              .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.select("query_id", "neighbor_id",
                         cosine_expr(F.col("__qv"), F.col("__cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def ivf_topk(queries: DataFrame, corpus: DataFrame,
             q_id: str, q_vec: str, c_id: str, c_vec: str,
             k: int = 10, cells: int = 16, nprobe: int = 4,
             seed: int = 42) -> DataFrame:
    """IVF-flat ANN: hash-sampled centroids, nearest-cell assignment,
    queries probe the ``nprobe`` closest cells.

    Centroids are ``cells`` deterministic corpus samples (xxhash-ranked),
    broadcast everywhere; assignment is an argmin over the broadcast list —
    one projection, no shuffle of the corpus beyond the final per-cell
    grouping which Catalyst folds into the candidate join."""
    # NULL vectors excluded before sampling (a NULL landing in the top
    # `cells` hash ranks crashed the driver materialization — review
    # find r4), and from assignment/probing below
    corpus = corpus.where(_valid_vec(F.col(c_vec)))
    queries = queries.where(_valid_vec(F.col(q_vec)))
    ranked = corpus.select(F.col(c_id).alias("cid"), F.col(c_vec).alias("cv"),
                           F.xxhash64(F.col(c_id).cast("string"), F.lit(seed))
                            .alias("__r"))
    # bounded collect: exactly `cells` rows
    cent_vecs = [[float(x) for x in row["cv"]]
                 for row in ranked.orderBy("__r").limit(cells).collect()]
    # ONE nested-array literal node (array<array<double>>): a per-dim F.lit
    # tree was cells × dims × (1+nprobe) Catalyst nodes — at 1024-dim × 256
    # cells the ~million-node plan blew up before any data ran (VERDICT r1).
    cent_lit = F.lit(cent_vecs)

    def nearest_cells(vec: Column, n: int) -> Column:
        scored = F.transform(
            cent_lit,
            lambda cv, i: F.struct((-cosine_expr(vec, cv)).alias("d"),
                                   i.alias("cell")))
        return F.slice(F.array_sort(scored), 1, n)

    c_assigned = corpus.select(
        F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv"),
        F.get(nearest_cells(F.col(c_vec), 1), 0)["cell"].alias("cell"))
    q_probed = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv"),
        F.explode(F.transform(nearest_cells(F.col(q_vec), nprobe),
                              lambda s: s["cell"])).alias("cell"))
    cand = q_probed.join(c_assigned, "cell") \
                   .dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select("query_id", "neighbor_id",
                         cosine_expr(F.col("__qv"), F.col("__cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def embedding_centroid_drift(a: DataFrame, b: DataFrame,
                             vec_col: str = "embedding") -> DataFrame:
    """Slice-level embedding-space drift: one row
    ``(centroid_cosine, mean_abs_diff, dims, n_a, n_b)`` comparing two
    corpus slices — the embedding-axis member of the drift family
    (numeric: KS/chi²/PSI histograms; pHash: Hamming-weight histograms;
    this: where the two slices POINT in embedding space).

    ``centroid_cosine`` is the cosine between the slices' mean vectors
    (1.0 = same direction; an encoder swap, a scraper-source shift, or
    a poisoning burst pulls it down long before per-row checks fire);
    ``mean_abs_diff`` is the average per-dimension |Δmean| — sensitive
    to small coordinate-wise shifts that barely move the angle.

    Scale: ``posexplode`` + per-``pos`` average is a map-side-combined
    aggregate — the exchange carries ``dims × partitions`` partial rows
    regardless of corpus size; the final join/statistics run over
    ``dims`` rows. NULL / empty vectors are excluded (they carry no
    direction); rows are counted per slice for the caller's minimum-
    sample gate.
    """
    def _ok(c):
        return _valid_vec(c) & (F.size(c) > 0)

    def centroid(df: DataFrame, name: str) -> DataFrame:
        return (df.where(_ok(F.col(vec_col)))
                  .select(F.posexplode(F.col(vec_col).cast("array<double>"))
                           .alias("pos", "v"))
                  .groupBy("pos").agg(F.avg("v").alias(name)))

    joined = centroid(a, "ca").join(centroid(b, "cb"), "pos")
    # the norm product is floored like cosine_expr's: a degenerate slice
    # whose per-dimension means all cancel to exactly 0 must yield a
    # harmless ~0 cosine, not an ANSI DIVIDE_BY_ZERO job crash
    stats = joined.agg(
        (F.sum(F.col("ca") * F.col("cb"))
         / F.greatest(F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                      * F.sqrt(F.sum(F.col("cb") * F.col("cb"))),
                      F.lit(1e-12)))
        .alias("centroid_cosine"),
        F.avg(F.abs(F.col("ca") - F.col("cb"))).alias("mean_abs_diff"),
        F.count(F.lit(1)).cast("long").alias("dims"))
    n_a = a.where(_ok(F.col(vec_col))) \
           .agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    n_b = b.where(_ok(F.col(vec_col))) \
           .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    return stats.crossJoin(n_a).crossJoin(n_b)
