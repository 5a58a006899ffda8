"""VARIANT fast-path parity: the Catalyst-native dynamic-JSON compiler must
agree with the semantics kernel on every spec it claims to support —
verified over the golden-suite fixtures whose schemas compile to VARIANT."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from sparkschema.compiler.variantcol import (VariantUnsupported,
                                             json_valid_auto,
                                             variant_valid_column)
from sparkschema.spec.jsonvalue import dump_json
from tests.conftest import REFERENCE, load_json, make_registry

FIXTURE_FILES = [
    "minimum.json", "maximum.json", "multipleOf.json", "type.json",
    "minLength.json", "maxLength.json", "pattern.json", "enum.json",
    "required.json", "properties.json", "items.json", "minItems.json",
    "maxItems.json", "uniqueItems.json", "allOf.json", "anyOf.json",
    "oneOf.json", "not.json",
    # r3: key-only object keywords compile natively now
    "minProperties.json", "maxProperties.json", "dependencies.json",
    "additionalProperties.json",
    # r3b: value-reading object keywords + tuple items via the
    # map<string,variant> / array<variant> views; $ref-bearing files run
    # too — those schemas fall back (skipped) via VariantUnsupported
    "patternProperties.json", "additionalItems.json", "default.json",
    "definitions.json", "ref.json",
]
D7_EXTRA = ["const.json", "contains.json", "if-then-else.json",
            "boolean_schema.json", "exclusiveMinimum.json",
            "exclusiveMaximum.json", "propertyNames.json"]


def _cases():
    out = []
    for d, names in (("draft4", FIXTURE_FILES), ("draft7", FIXTURE_FILES + D7_EXTRA)):
        for n in names:
            p = f"{REFERENCE}/src/test/resources/{d}/{n}"
            if os.path.exists(p):
                out.append((d, p))
    return out


def test_variant_path_matches_kernel_on_golden_corpus(spark):
    total = checked = skipped = 0
    failures = []
    for dialect, path in _cases():
        for case in load_json(path):
            schema = case["schema"]
            rows = [(i, dump_json(t["data"])) for i, t in enumerate(case["tests"])]
            df = spark.createDataFrame(rows, "i int, j string")
            try:
                got_col = variant_valid_column("j", schema)
            except VariantUnsupported:
                skipped += len(rows)
                continue
            got = {r.i: r.ok for r in df.select("i", got_col.alias("ok")).collect()}
            for i, t in enumerate(case["tests"]):
                total += 1
                reg = make_registry(dialect)
                expected = not reg.validate(schema, t["data"])
                checked += 1
                if bool(got[i]) != expected:
                    failures.append(
                        f"{os.path.basename(path)} | {case['description']} | "
                        f"{t['description']}: variant={got[i]} kernel={expected}")
    assert not failures, f"{len(failures)} mismatches:\n" + "\n".join(failures[:20])
    assert checked > 300, (checked, skipped)  # the fast path must cover plenty


def test_json_valid_auto_falls_back(spark):
    df = spark.createDataFrame([(1, '{"a": {"b": 1}}')], "id long, j string")
    # $ref is variant-unsupported → Arrow kernel fallback
    schema = {"definitions": {"obj": {"type": "object"}},
              "properties": {"a": {"$ref": "#/definitions/obj"}}}
    got = df.select(json_valid_auto("j", schema).alias("ok")).collect()
    assert got[0].ok is True


def test_json_valid_auto_duplicate_keys_hybrid(spark):
    """Spark's variant parser rejects duplicate-key objects the reference
    (Jackson last-wins) accepts — json_valid_auto re-routes exactly those
    rows through the Arrow kernel, so the verdict matches the kernel."""
    rows = [(1, '{"k": 1, "k": 5}'),    # last-wins k=5 → valid
            (2, '{"k": 1, "k": -3}'),   # last-wins k=-3 → invalid
            (3, '{"k": 2}'),            # normal fast-path row
            (4, '{"k": 1,}'),           # both parsers reject → invalid
            (5, None)]                  # NULL text → NULL verdict
    df = spark.createDataFrame(rows, "id long, j string")
    spec = {"properties": {"k": {"minimum": 0}}}
    got = {r.id: r.ok for r in
           df.select("id", json_valid_auto("j", spec).alias("ok")).collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: None}, got


def test_variant_null_vs_absent(spark):
    """VARIANT preserves the reference's JsUndefined-vs-JsNull distinction."""
    df = spark.createDataFrame(
        [(1, '{"k": null}'), (2, '{}'), (3, '{"k": 1}')], "id long, j string")
    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer"}}}
    got = {r.id: r.ok for r in
           df.select("id", variant_valid_column("j", schema).alias("ok")).collect()}
    # k=null: present (required ok) but fails type integer
    assert got == {1: False, 2: False, 3: True}


def test_json_valid_auto_refs_stay_native_on_golden_corpus(spark):
    """r4: json_valid_auto inlines non-recursive $refs at compile time, so
    the ref/refRemote/definitions fixture files should now mostly run on
    the VARIANT path — and agree with the kernel either way. Counts how
    many cases compiled natively (must be a solid majority; recursive
    refs legitimately fall back)."""
    native = fallback = 0
    failures = []
    for dialect in ("draft4", "draft7"):
        for name in ("ref.json", "refRemote.json", "definitions.json"):
            path = f"{REFERENCE}/src/test/resources/{dialect}/{name}"
            if not os.path.exists(path):
                continue
            for case in load_json(path):
                schema = case["schema"]
                reg = make_registry(dialect)
                rows = [(i, dump_json(t["data"]))
                        for i, t in enumerate(case["tests"])]
                df = spark.createDataFrame(rows, "i int, j string")
                from sparkschema.compiler.variantcol import (
                    _inline_refs_for_variant)
                inlined = _inline_refs_for_variant(schema, reg, dialect)
                try:
                    variant_valid_column("j", inlined)
                    native += len(rows)
                except VariantUnsupported:
                    fallback += len(rows)
                col = json_valid_auto("j", schema, registry=reg,
                                      dialect=dialect)
                got = {r.i: r.ok for r in
                       df.select("i", col.alias("ok")).collect()}
                for i, t in enumerate(case["tests"]):
                    expected = not reg.validate(schema, t["data"])
                    if bool(got[i]) != expected:
                        failures.append(
                            f"{dialect}/{name} | {case['description']} | "
                            f"{t['description']}: auto={got[i]} "
                            f"kernel={expected}")
    assert not failures, (f"{len(failures)} mismatches:\n"
                          + "\n".join(failures[:20]))
    assert native > fallback, (native, fallback)
    assert native >= 40, (native, fallback)
