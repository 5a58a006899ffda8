"""Round-4 third review sweep: spec-kernel and table-compiler edge cases
(registry pollution, $id scope during inlining, format strictness parity,
parser keyword-shape validation, ref-hop-only depth cap, custom formats
over all value types, boolean property schemas)."""

import pytest

from sparkschema.spec.parser import SpecError
from sparkschema.spec.registry import SpecRegistry


def test_registry_validate_does_not_pollute_index():
    """Review find r4: one-shot validate() registered the ad-hoc document's
    $id scopes into the long-lived index via setdefault, permanently
    shadowing a later add_schema with the same $id."""
    reg = SpecRegistry("draft7")
    adhoc = {"$id": "urn:x:shared", "type": "integer"}
    assert not reg.validate(adhoc, 5)

    # later, the REAL document claims the same $id with different content
    reg.add_schema("urn:x:shared", {"type": "string"})
    verdict = reg.validate({"$ref": "urn:x:shared"}, "hello")
    assert not verdict, ("stale ad-hoc subschema shadowed the registered "
                         f"document: {verdict}")


def test_inline_refs_honors_id_scope(spark):
    """Review find r4: inline_refs never refined the scope on $id-bearing
    nodes, so refs beneath a rebased subtree resolved against the outer
    base (kernel parity broken on the compiled path)."""
    from pyspark.sql import functions as F

    from sparkschema.compiler.table import compile_table_spec

    reg = SpecRegistry("draft7")
    reg.add_schema("http://x.test/sub.json", {"minimum": 10})
    spec = {
        "$id": "http://x.test/a.json",
        "properties": {"v": {"$ref": "sub.json"}},  # relative to the $id
    }
    df = spark.createDataFrame([(5,), (15,)], "v long")
    cts = compile_table_spec(spec, df, key_cols=["v"], registry=reg)
    got = {r.v: r.ok for r in
           df.select("v", cts.row_valid().alias("ok")).collect()}
    assert got == {5: False, 15: True}
    # kernel agrees
    assert reg.validate(spec, {"v": 5})
    assert not reg.validate(spec, {"v": 15})


def test_datetime_format_requires_offset():
    """Review find r4: fromisoformat accepted naive datetimes, diverging
    from the reference's OffsetDateTime.parse and the SQL twin."""
    reg = SpecRegistry("draft7")
    spec = {"format": "date-time"}
    assert not reg.validate(spec, "2020-01-01T12:00:00Z")
    assert not reg.validate(spec, "2020-01-01T12:00:00+05:30")
    assert reg.validate(spec, "2020-01-01T12:00:00")      # naive: invalid
    assert reg.validate(spec, "2020-01-01 12:00:00+00:00")  # no T


def test_date_format_requires_padding():
    """Review find r4: strptime accepted '2020-1-1'; RFC 3339 full-date
    (and the SQL twin's anchored regex) require zero padding."""
    reg = SpecRegistry("draft7")
    spec = {"format": "date"}
    assert not reg.validate(spec, "2020-01-01")
    assert reg.validate(spec, "2020-1-1")
    assert reg.validate(spec, "2020-13-01")


def test_parser_rejects_list_for_single_schema_keywords():
    """Review find r4: a JSON array for not/contains/if/... slipped
    through parse_spec and evaluated as a vacuous-pass schema (inverting
    under 'not')."""
    from sparkschema.spec.parser import parse_spec

    parse_spec({"items": [{"type": "string"}]})  # tuple form is legal
    for kw in ("not", "contains", "if", "additionalProperties",
               "propertyNames"):
        with pytest.raises(SpecError):
            parse_spec({kw: [{"type": "string"}]})


def test_depth_cap_counts_only_ref_hops():
    """Review find r4: structural keyword nesting consumed the MaxDepth
    budget, so >100-level ref-free schemas emitted a spurious
    err.max.depth; the reference's cap lives in the ref resolver."""
    reg = SpecRegistry("draft7")
    spec: dict = {"type": "integer"}
    value: object = 1
    for _ in range(150):
        spec = {"properties": {"a": spec}, "type": "object"}
        value = {"a": value}
    assert not reg.validate(spec, value)

    # a 150-hop ref CHAIN still trips the cap
    chain = {f"urn:c:{i}": {"$ref": f"urn:c:{i + 1}"} for i in range(150)}
    chain["urn:c:150"] = {"type": "integer"}
    reg2 = SpecRegistry("draft7")
    for uri, doc in chain.items():
        reg2.add_schema(uri, doc)
    vio = reg2.validate({"$ref": "urn:c:0"}, 1)
    assert vio and any("max" in (v.msg or "") or v.keyword == "$ref"
                       for v in vio)


def test_custom_format_applies_to_all_value_types():
    """Review find r4: add_format checkers only ran for numbers and
    strings; the reference's SchemaFormat receives any JsValue."""
    reg = SpecRegistry("draft7")
    reg.add_format("nonempty", lambda v: bool(v))
    spec = {"format": "nonempty"}
    assert reg.validate(spec, [])          # empty array fails
    assert not reg.validate(spec, [1])
    assert reg.validate(spec, {})          # empty object fails
    assert not reg.validate(spec, {"a": 1})
    assert reg.validate(spec, False)
    assert not reg.validate(spec, True)
    assert reg.validate(spec, "")          # strings still consult it
    assert reg.validate(spec, 0)           # and numbers


def test_boolean_property_schema_compiles(spark):
    """Review find r4: {'properties': {'a': false}} silently compiled to
    zero checks; the kernel fails any present value."""
    from sparkschema.compiler.table import compile_table_spec

    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, a string")
    cts = compile_table_spec({"properties": {"a": False}}, df,
                             key_cols=["id"])
    got = {r.id: r.ok for r in
           df.select("id", cts.row_valid().alias("ok")).collect()}
    assert got == {1: False, 2: True}  # absent (NULL) passes, present fails


def test_multiple_of_extreme_divisors_columnar(spark):
    """Review find r4 (three tiers): scale>18 divisors flagged true
    multiples below 2^53; >38-digit DECIMAL divisors were assumed
    binary-representable; multipleOf 0 compiled to `col % 0`."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from sparkschema.compiler.columns import ColumnCompiler
    from sparkschema.spec.registry import SpecRegistry

    cc = ColumnCompiler()
    reg = SpecRegistry("draft7")
    rows = [(1, 1e-19), (2, 3e-19), (3, 1.5e-19), (4, 1e40), (5, 0.5),
            (6, 0.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    dt = df.schema["v"].dataType

    cases = [{"multipleOf": Decimal("1E-19")},
             {"multipleOf": Decimal("1E+40")},
             {"multipleOf": 0}]
    cols = [cc.compile_valid(spec, F.col("v"), dt).alias(f"c{j}")
            for j, spec in enumerate(cases)]
    got = {r.id: r for r in df.select("id", *cols).collect()}
    for j, spec in enumerate(cases):
        for rid, v in rows:
            expected = not reg.validate(spec, v)
            g = bool(got[rid][f"c{j}"])
            assert g == expected, (spec, v, g, expected)

    # long column + multipleOf 0 must not DIVIDE_BY_ZERO under ANSI
    dl = spark.createDataFrame([(1, 7), (2, 0)], "id long, v long")
    colz = cc.compile_valid({"multipleOf": 0}, F.col("v"),
                            dl.schema["v"].dataType)
    gz = {r.id: r.ok for r in dl.select("id", colz.alias("ok")).collect()}
    assert gz == {1: False, 2: False}  # kernel: nothing is a multiple of 0
