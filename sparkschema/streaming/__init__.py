"""Resumability (checkpoint manifest with per-partition lineage) and the
Structured Streaming wrapper over the same compiled stateless checks."""
