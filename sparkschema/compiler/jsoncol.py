"""Dynamic-JSON validation over a string column — the Arrow-batched path.

Typed columns take the pure-Catalyst fast path
(:mod:`sparkschema.compiler.columns`). Arbitrary, recursively-nested JSON
documents (the reference's native input — one ``JsValue`` per call,
SURVEY.md §1.1) cannot be expressed with built-in operators at full
draft-4/7 fidelity (recursive ``$ref``, tuple ``items``, JSON deep-equality
``uniqueItems``), so this module wraps the semantics kernel
(:mod:`sparkschema.spec.interpreter`) in a **vectorized pandas UDF**: Arrow
batch transfer, one Python invocation per ~10k values, validator compiled
once per executor (not per row).

The spec and its registry documents are broadcast as plain JSON text and
rebuilt lazily worker-side (driver-only compile, SURVEY.md §3 lifecycle).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VIOLATION_ARRAY_TYPE = T.ArrayType(T.StructType([
    T.StructField("keyword", T.StringType()),
    T.StructField("schema_path", T.StringType()),
    T.StructField("instance_path", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("msg", T.StringType()),
    # nested sub-errors (compact JSON) + ref metadata, as in the
    # reference's error object (SchemaUtil.scala:28-39, Results.scala:42-43)
    T.StructField("errors", T.StringType()),
    T.StructField("resolution_scope", T.StringType()),
    T.StructField("referrer", T.StringType()),
]))


def _build_validator(schema_text: str, docs_text: str, dialect: str,
                     formats=None):
    """Executor-side: rebuild registry + validator once per python worker.
    ``formats`` re-registers the driver registry's custom format checkers
    (shipped through the UDF closure via cloudpickle) — without them,
    ``add_format`` checks silently validated as success on executors
    (unknown format ⇒ pass; review find r4)."""
    from sparkschema.spec.jsonvalue import parse_json
    from sparkschema.spec.refs import Scope
    from sparkschema.spec.registry import SpecRegistry, sniff_dialect

    schema = parse_json(schema_text)
    reg = SpecRegistry(dialect)
    for name, fn in (formats or {}).items():
        reg.add_format(name, fn)
    # parse_json (not json.loads): fractional keyword values must come back
    # as Decimal so is_number()/multipleOf see them (BigDecimal parity).
    for uri, doc in parse_json(docs_text).items():
        reg.add_schema(uri, doc)
    root_uri = "urn:sparkschema:jsoncol"
    reg.index.add_document(root_uri, schema, sniff_dialect(schema, dialect))
    return reg.validator(), schema, Scope(schema, root_uri)


def _make_udfs(schema: Any, registry, dialect: str | None):
    from sparkschema.spec.jsonvalue import dump_json_exact

    # dump_json_exact keeps Decimal keyword values (minimum: 0.5, multipleOf:
    # 0.25, ...) as JSON numbers; json.dumps(default=str) would quote them and
    # the executor-side rebuild would silently drop the keyword.
    schema_text = dump_json_exact(schema) if not isinstance(schema, str) else schema
    docs_text = dump_json_exact(getattr(registry, "_docs", {}) or {})
    # the registry's own dialect wins when the caller didn't name one —
    # a SpecRegistry("draft4") previously validated with draft7 keyword
    # semantics on executors (review find r4)
    dialect = dialect or getattr(registry, "dialect", None) or "draft7"
    formats = dict(getattr(registry, "_formats", {}) or {})

    state: dict[str, Any] = {}

    def get_validator():
        if "v" not in state:
            state["v"] = _build_validator(schema_text, docs_text, dialect,
                                          formats)
        return state["v"]

    @F.pandas_udf(T.BooleanType())
    def is_valid_udf(s):
        import pandas as pd

        from sparkschema.spec.jsonvalue import parse_json
        validator, sch, scope = get_validator()

        def one(txt):
            if txt is None:
                return None
            try:
                value = parse_json(txt)
            except Exception:
                return False  # err.parse.json
            return not validator.validate(sch, value, scope)

        return pd.Series([one(x) for x in s])

    @F.pandas_udf(VIOLATION_ARRAY_TYPE)
    def violations_udf(s):
        import pandas as pd

        from sparkschema.spec.jsonvalue import parse_json
        validator, sch, scope = get_validator()

        def one(txt):
            if txt is None:
                return []
            try:
                value = parse_json(txt)
            except Exception:
                return [("parse", "#", "/", str(txt)[:256],
                         "Could not parse JSON.", "", "", "")]
            return [tuple(v) for v in validator.validate(sch, value, scope)]

        return pd.Series([one(x) for x in s])

    return is_valid_udf, violations_udf


def json_valid_column(json_col: Column | str, schema: Any,
                      registry=None, dialect: str | None = None) -> Column:
    """Boolean Column: does the JSON text in ``json_col`` satisfy ``schema``?"""
    is_valid_udf, _ = _make_udfs(schema, registry, dialect)
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return is_valid_udf(col)


def validate_json_column(df: DataFrame, json_col: str, schema: Any,
                         key_cols: list[str] | None = None,
                         registry=None, dialect: str | None = None) -> DataFrame:
    """Violation rows for a JSON-text column: ``(key..., keyword,
    schema_path, instance_path, value, msg)`` — same contract as the
    typed-table path."""
    _, violations_udf = _make_udfs(schema, registry, dialect)
    keys = key_cols or [df.columns[0]]
    return (
        df.select(*keys, violations_udf(F.col(json_col)).alias("__viol"))
        .where(F.size("__viol") > 0)
        .select(*keys, F.explode("__viol").alias("v"))
        .select(*keys, "v.*")
    )
