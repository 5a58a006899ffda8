"""Table sources: storage-interface loaders (parquet now, Iceberg when the
catalog jar is present) and the deterministic synthetic image generator."""
