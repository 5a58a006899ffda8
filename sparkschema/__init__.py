"""sparkschema — a PySpark-native schema & constraint validation engine.

A from-scratch re-expression of the keyword *semantics* of JSON Schema
draft-4 / draft-7 (as implemented by the reference project
eclipsesource/play-json-schema-validator) as:

- compiled Catalyst ``Column`` predicate trees over typed tables
  (:mod:`sparkschema.compiler`),
- a vectorized Arrow/pandas-UDF batch kernel for arbitrary dynamic JSON
  values (:mod:`sparkschema.spec.interpreter` via
  :func:`sparkschema.compiler.jsoncol.validate_json_column`),
- table-level statistics / uniqueness / referential / drift operators
  (:mod:`sparkschema.operators`).

Nothing here is a port: the reference is a single-JVM recursive AST
interpreter (see SURVEY.md); this engine declares logical plans with the
DataFrame API and lets Catalyst/Tungsten choose physical execution.
"""

__version__ = "0.1.0"

from sparkschema.spec.registry import SpecRegistry  # noqa: F401
from sparkschema.spec.parser import parse_spec  # noqa: F401
