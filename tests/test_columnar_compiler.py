"""Columnar-vs-kernel parity: the Catalyst predicate compiler must agree
with the semantics kernel on every keyword it compiles, for every typed
column. NULL column values model the absent property and vacuously pass
every per-value keyword (SURVEY.md §1.4 undefined/null collapse)."""

import pytest
from pyspark.sql import functions as F

from sparkschema.compiler.columns import ColumnCompiler
from sparkschema.spec.interpreter import Validator

INT_VALUES = [None, -3, 0, 1, 2, 3, 7, 8, 10, 100, 2**40]
DOUBLE_VALUES = [None, -1.5, 0.0, 0.5, 1.0, 2.0, 2.5, 3.0, 9.75, 1e9]
STRING_VALUES = [None, "", "a", "abc", "img-000000000001", "IMG-1", "hello world",
                 "2019-01-01T00:00:00Z", "not a date", "10.0.0.1", "999.1.1.1",
                 "a@b.com", "@nope", "f47ac10b-58cc-4372-a567-0e02b2c3d479"]
BOOL_VALUES = [None, True, False]
ARRAY_INT_VALUES = [None, [], [1], [1, 2, 3], [1, 1, 2], [5, 6, 7, 8, 9]]

SPECS_INT = [
    {"type": "integer"},
    {"type": "number", "minimum": 1},
    {"minimum": 0, "exclusiveMinimum": True},
    {"maximum": 8},
    {"type": "number", "exclusiveMaximum": 8},
    {"multipleOf": 2},
    {"enum": [1, 2, 3]},
    {"const": 8},
    {"format": "int32"},
    {"allOf": [{"minimum": 0}, {"maximum": 10}]},
    {"anyOf": [{"maximum": 0}, {"minimum": 8}]},
    {"oneOf": [{"minimum": 5}, {"maximum": 2}]},
    {"not": {"minimum": 5}},
    {"if": {"minimum": 5}, "then": {"multipleOf": 2}, "else": {"minimum": 0}},
]
SPECS_DOUBLE = [
    {"type": "integer"},
    {"type": "number", "minimum": 0.5},
    {"exclusiveMaximum": 2.5},
    {"multipleOf": 0.5},
    {"enum": [0.5, 1, 2.5]},
    {"minimum": 0, "maximum": 3},
]
SPECS_STRING = [
    {"type": "string", "minLength": 1},
    {"maxLength": 5},
    {"pattern": "^img-[0-9]{12}$"},
    {"pattern": "world"},
    {"enum": ["a", "abc", 1]},
    {"const": "abc"},
    {"format": "date-time"},
    {"format": "ipv4"},
    {"format": "email"},
    {"format": "uuid"},
    {"format": "no-such-format"},
    {"allOf": [{"minLength": 1}, {"maxLength": 3}]},
    {"if": {"pattern": "^img"}, "then": {"minLength": 10}},
]
SPECS_ARRAY = [
    {"minItems": 1},
    {"maxItems": 3},
    {"uniqueItems": True},
    {"items": {"minimum": 2}},
    {"contains": {"minimum": 7}},
    {"items": [{"minimum": 1}, {"maximum": 5}]},
    {"items": [{"minimum": 1}], "additionalItems": False},
    {"items": [{"minimum": 1}], "additionalItems": {"maximum": 8}},
]


def _cross_check(spark, values, spark_type, specs):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               schema=f"i int, x {spark_type}")
    cc = ColumnCompiler()
    kernel = Validator()
    cols = [cc.compile_valid(spec, F.col("x"), df.schema["x"].dataType).alias(f"s{j}")
            for j, spec in enumerate(specs)]
    got = {r["i"]: r for r in df.select("i", *cols).collect()}
    problems = []
    for j, spec in enumerate(specs):
        for i, v in enumerate(values):
            columnar = got[i][f"s{j}"]
            if v is None:
                expected = True  # absent ⇒ vacuous pass
            else:
                expected = not kernel.validate(spec, v)
            if bool(columnar) != expected:
                problems.append(f"spec={spec} value={v!r}: columnar={columnar} kernel={expected}")
    assert not problems, "\n".join(problems)


def test_integer_column_parity(spark):
    _cross_check(spark, INT_VALUES, "bigint", SPECS_INT)


def test_double_column_parity(spark):
    _cross_check(spark, DOUBLE_VALUES, "double", SPECS_DOUBLE)


def test_string_column_parity(spark):
    _cross_check(spark, STRING_VALUES, "string", SPECS_STRING)


def test_boolean_column_parity(spark):
    _cross_check(spark, BOOL_VALUES, "boolean",
                 [{"type": "boolean"}, {"const": True}, {"enum": [True]},
                  {"enum": [False, "x"]}, {"type": "string"}])


def test_array_column_parity(spark):
    _cross_check(spark, ARRAY_INT_VALUES, "array<bigint>", SPECS_ARRAY)


def test_violations_contract(spark):
    """Violation rows carry the reference's error-object fields."""
    from sparkschema.compiler.table import compile_table_spec

    df = spark.createDataFrame(
        [("img-000000000001", 64, "jpg"), ("bad id", 0, "tiff"), (None, 128, "png")],
        schema="image_id string, w int, fmt string",
    )
    spec = {
        "type": "object",
        "required": ["image_id"],
        "properties": {
            "image_id": {"type": "string", "pattern": "^img-[0-9]{12}$"},
            "w": {"type": "integer", "minimum": 1, "maximum": 16384},
            "fmt": {"enum": ["raw", "rawz", "png", "jpg"]},
        },
    }
    cts = compile_table_spec(spec, df, key_cols=["image_id"])
    rows = {(r.keyword, r.instance_path): r for r in cts.violations(df).collect()}
    assert set(rows) == {("pattern", "/image_id"), ("minimum", "/w"),
                         ("enum", "/fmt"), ("required", "/image_id")}
    assert rows[("pattern", "/image_id")].msg == \
        "'bad id' does not match pattern '^img-[0-9]{12}$'."
    assert rows[("minimum", "/w")].msg == "0 is smaller than required minimum value of 1."
    assert rows[("required", "/image_id")].msg == "Property image_id missing."
    assert rows[("pattern", "/image_id")].schema_path == "#/properties/image_id/pattern"


def test_verdicts_shape(spark):
    from sparkschema.compiler.table import compile_table_spec

    df = spark.createDataFrame([(i, i % 5) for i in range(100)], "id long, v int")
    cts = compile_table_spec(
        {"properties": {"v": {"minimum": 1}}, "required": ["id"]}, df, key_cols=["id"])
    verd = cts.verdicts(df).collect()
    by_check = {}
    for r in verd:
        by_check.setdefault(r.check, []).append(r)
    assert set(by_check) == {"minimum:/v", "required:/id"}
    total_fails = sum(r.metrics["fail_count"] for r in by_check["minimum:/v"])
    assert total_fails == 20  # v==0 rows
    assert all(r["pass"] for r in by_check["required:/id"])


def test_ref_inlining_and_cycle_error(spark):
    from sparkschema.compiler.table import compile_table_spec
    from sparkschema.spec.parser import SpecError
    from sparkschema.spec.registry import SpecRegistry

    df = spark.createDataFrame([(5,), (50,)], "w int")
    reg = SpecRegistry()
    reg.add_schema("urn:dims", {"definitions": {"small": {"maximum": 10}}})
    spec = {"properties": {"w": {"$ref": "urn:dims#/definitions/small"}}}
    cts = compile_table_spec(spec, df, key_cols=["w"], registry=reg)
    # violation key columns are cast to string (uniform report schema)
    assert [r.w for r in cts.violations(df).collect()] == ["50"]

    reg2 = SpecRegistry()
    reg2.add_schema("urn:loop", {"$id": "urn:loop", "properties": {"w": {"$ref": "urn:loop#/properties/w"}}})
    with pytest.raises(SpecError):
        compile_table_spec({"properties": {"w": {"$ref": "urn:loop#/properties/w"}}},
                           df, key_cols=["w"], registry=reg2)
