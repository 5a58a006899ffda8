"""PII detection and redaction over text columns.

The standard pre-training scrub pass (C4/Dolma-style): find emails,
phone numbers, IPv4 addresses and SSN-shaped ids in a document column,
count them per kind, and rewrite the text with typed placeholders.
Everything is pure Catalyst expressions (``regexp_count`` /
``regexp_replace``) — whole-stage codegen, no shuffle, no Python — so
the pass is embarrassingly parallel: at 10^12 rows it runs inside the
same per-partition scan as the rest of the validation/stat pass.

The reference project has no PII surface (it validates structure, not
content — ``SchemaValidatorSpec.scala`` exercises keywords only); this
module is part of the training-data-pipeline mandate layered on top of
the same engine.

Dialect contract: every pattern lives in the Java-regex ∩ RE2 common
subset (character classes, bounded repetition, non-capturing groups,
``\\b`` word boundaries — no lookaround, no backreferences) so the
DuckDB differential oracle executes the SAME pattern strings verbatim.

NULL semantics: NULL text produces NULL counts and NULL redacted text
(NULL-in-NULL-out, same contract as ``text.quality_score`` after the
r4 fix) — an absent document has no PII facts, not zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first (its local part can swallow digit runs), then
# ipv4 (dots), then ssn/phone (disjoint digit groupings: 3-2-4 cannot
# match inside 3-3-4 across a ``\b`` — but the fixed order makes the
# composition deterministic regardless).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts for ``col``; keys are the pattern kinds.

    ``regexp_count`` is NULL-propagating, so NULL text yields NULL
    counts for every kind.
    """
    return {kind: F.regexp_count(col, F.lit(pat))
            for kind, pat, _ in PII_PATTERNS}


def pii_redact(col: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder.

    Replacements apply in ``PII_PATTERNS`` order (a redacted span is
    never re-scanned by a later pattern because the placeholders
    contain no digits or ``@``). NULL text stays NULL.
    """
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII report: one row per input row with per-kind
    counts (``n_<kind>``), the total (``n_pii``), and the md5 of the
    redacted text (``redacted_md5`` — a value-level equivalence witness
    that is 16 bytes per row regardless of document size, so the report
    is safe to materialize at any scale; the redacted TEXT itself stays
    an expression callers can select when they actually want it).
    """
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.cast("long").alias(f"n_{k}") for k, c in counts.items()],
        total.cast("long").alias("n_pii"),
        F.md5(pii_redact(F.col(text_col)).cast("binary")).alias("redacted_md5"),
    )
