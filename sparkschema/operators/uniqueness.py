"""Uniqueness checks — the table-level re-expression of ``uniqueItems``
(reference: internal/validators/ArrayConstraintValidators.scala:76-95;
SURVEY.md §2.4 "salted hash-aggregate").

Scale design: a duplicate-key check is a two-phase aggregation. Phase 1
groups by ``(key, salt)`` where the salt derives from the *physical
partition id*, so a pathologically hot key (billions of identical
``phash`` values) is first collapsed within each of S salt lanes — no
single reducer ever receives more than 1/S of a hot key's partials.
Phase 2 sums the per-salt partial counts per key. For well-distributed
keys the salt is ~free (map-side combine already collapses per-partition
duplicates); for skewed keys it bounds the worst reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, keys: list[str] | str,
                   salt_lanes: int = 16) -> DataFrame:
    """Keys occurring more than once: ``(key..., dup_count)``.

    ``salt_lanes`` controls skew resistance; 1 disables salting.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if salt_lanes > 1:
        phase1 = (
            df.groupBy(*keys, (F.spark_partition_id() % salt_lanes).alias("__salt"))
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        counted = phase1.groupBy(*keys).agg(F.sum("__c").alias("dup_count"))
    else:
        counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))
    return counted.where(F.col("dup_count") > 1)


def duplicate_violations(df: DataFrame, keys: list[str] | str,
                         salt_lanes: int = 16,
                         keyword: str = "x-unique") -> DataFrame:
    """Duplicate keys rendered as violation rows matching the engine's
    violation contract (keyword, schema_path, instance_path, value, msg)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    dups = duplicate_keys(df, keys, salt_lanes)
    value = F.concat_ws(",", *[F.col(k).cast("string") for k in keys])
    return dups.select(
        *keys,
        F.lit(keyword).alias("keyword"),
        F.lit("#/x-unique/" + "/".join(keys)).alias("schema_path"),
        F.lit("/" + keys[0]).alias("instance_path"),
        value.alias("value"),
        F.concat(F.lit("Key "), value, F.lit(" is duplicated "),
                 F.col("dup_count").cast("string"), F.lit(" times.")).alias("msg"),
    )


def uniqueness_verdict(df: DataFrame, keys: list[str] | str,
                       salt_lanes: int = 16) -> DataFrame:
    """One verdict row: ``(check, pass, dup_keys, dup_rows)``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    dups = duplicate_keys(df, keys, salt_lanes)
    return dups.agg(
        F.lit("unique:" + ",".join(keys)).alias("check"),
        (F.count(F.lit(1)) == 0).alias("pass"),
        F.count(F.lit(1)).alias("dup_keys"),
        F.coalesce(F.sum("dup_count"), F.lit(0)).alias("dup_rows"),
    )
