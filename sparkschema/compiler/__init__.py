"""Spec → Catalyst compilation: typed-table column predicates, violation-row
assembly, per-partition verdicts, and the vectorized dynamic-JSON path."""
