"""Storage interface.

The design target is an Iceberg catalog table (BASELINE.json input_hint);
this sandbox has no Iceberg jar, so the loader is format-pluggable behind
one function. Iceberg adds snapshot-id lineage (recorded by the checkpoint
manifest, see sparkschema.streaming.checkpoint) and metadata-level
partition pruning; the parquet fallback preserves the same logical plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, path_or_ident: str,
               fmt: str | None = None) -> DataFrame:
    """Load a table by parquet path or catalog identifier."""
    if fmt == "iceberg" or (fmt is None and "/" not in path_or_ident):
        try:
            return spark.read.format("iceberg").load(path_or_ident)
        except Exception:
            if "/" not in path_or_ident:
                raise
    return spark.read.parquet(path_or_ident)


def table_snapshot_id(spark: SparkSession, ident: str) -> str | None:
    """Current Iceberg snapshot id for a catalog table, or None when the
    table isn't Iceberg / no Iceberg runtime is on the classpath. Recorded
    by the checkpoint manifest for lineage pinning
    (streaming.checkpoint.Manifest.record snapshot_id)."""
    try:
        row = spark.sql(
            f"select snapshot_id from {ident}.snapshots "
            f"order by committed_at desc limit 1").collect()
        return str(row[0][0]) if row else None
    except Exception:
        return None


def load_testdata(spark: SparkSession, sf_dir: str,
                  names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out
