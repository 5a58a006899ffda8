"""Layer-4 golden tests: exact violation-row field assertions, mirroring the
reference's ErrorReportingSpec.scala:19-118 / SchemaValidatorSpec.scala:319-327
(FIXTURES.md §4)."""

from sparkschema.spec.registry import SpecRegistry


def validate(schema, value, dialect="draft7"):
    return SpecRegistry(dialect).validate(schema, value)


def test_wrong_type_message():
    errs = validate({"type": "integer"}, "not-an-int")
    assert len(errs) == 1
    v = errs[0]
    assert v.keyword == "type"
    assert v.msg == "Wrong type. Expected integer, was string."
    assert v.instance_path == "/"
    assert v.schema_path == "#/type"


def test_wrong_type_nested_instance_path():
    errs = validate(
        {"type": "object", "properties": {"w": {"type": "integer"}}},
        {"w": "wide"},
    )
    assert [ (e.keyword, e.instance_path, e.msg) for e in errs ] == [
        ("type", "/w", "Wrong type. Expected integer, was string.")
    ]
    assert errs[0].schema_path == "#/properties/w/type"


def test_min_length_message():
    errs = validate({"type": "string", "minLength": 5}, "abc")
    assert errs[0].keyword == "minLength"
    assert errs[0].msg == "'abc' does not match minimum length of 5."


def test_max_length_and_pattern_messages():
    errs = validate({"maxLength": 2, "pattern": "^[0-9]+$"}, "abc")
    msgs = {e.keyword: e.msg for e in errs}
    assert msgs["maxLength"] == "'abc' exceeds maximum length of 2."
    assert msgs["pattern"] == "'abc' does not match pattern '^[0-9]+$'."


def test_one_of_none_and_many():
    # note: a bare {"minimum": 2} would vacuously pass a string (keywords
    # only constrain their own type) — pin the type to make "none" reachable
    schema = {"oneOf": [{"type": "integer"}, {"type": "number", "minimum": 2}]}
    none = validate(schema, "str")
    assert any(e.msg == "Instance does not match any schema." for e in none)
    many = validate(schema, 3)
    assert [e.msg for e in many] == ["Instance matches more than one schema."]


def test_unresolved_ref_message():
    errs = validate({"$ref": "#/does/not/exist"}, 1)
    assert errs[0].keyword == "$ref"
    assert errs[0].msg == "Could not resolve ref #/does/not/exist."


def test_required_missing_property():
    errs = validate(
        {"type": "object", "required": ["image_id"], "properties": {"image_id": {"type": "string"}}},
        {},
    )
    assert errs[0].keyword == "required"
    assert errs[0].msg == "Property image_id missing."


def test_additional_properties_names_extras():
    errs = validate({"properties": {"a": {}}, "additionalProperties": False}, {"a": 1, "z": 2, "y": 3})
    assert errs[0].msg == "Additional properties are not allowed, but found properties y, z."


def test_false_schema_and_max_depth():
    errs = validate(False, 42)
    assert errs[0].msg == "Boolean false schema encountered."
    # unbounded data recursion hits the depth cap, not a stack overflow
    reg = SpecRegistry("draft7")
    schema = {"$id": "urn:rec", "properties": {"next": {"$ref": "urn:rec"}}}
    reg.add_schema("urn:rec", schema)
    deep = {}
    cur = deep
    for _ in range(300):
        cur["next"] = {}
        cur = cur["next"]
    errs = reg.validate(schema, deep)
    assert any(e.msg == "Maximum recursion depth reached." for e in errs)


def test_violations_accumulate_across_keywords():
    # no global fail-fast (Results.merge semantics, SURVEY.md §3)
    errs = validate(
        {"type": "object",
         "properties": {"w": {"type": "integer", "minimum": 1},
                        "caption": {"type": "string", "minLength": 1}},
         "required": ["fmt"]},
        {"w": 0, "caption": ""},
    )
    kws = sorted(e.keyword for e in errs)
    assert kws == ["minLength", "minimum", "required"]


def test_grapheme_cluster_lengths():
    """minLength/maxLength count grapheme clusters like the reference's
    BreakIterator (SURVEY.md §7 watch-list item): combining sequences are
    one cluster, astral codepoints are one cluster."""
    combining = "e\u0301"  # e + COMBINING ACUTE ACCENT -> 1 cluster
    assert not validate({"maxLength": 1}, combining)
    assert validate({"minLength": 2}, combining)
    astral = "\U0001F4A9"
    assert not validate({"maxLength": 1}, astral)
    assert not validate({"minLength": 1}, astral)
    # the reference golden case: two supplementary codepoints are length 2
    assert not validate({"maxLength": 2}, astral * 2)
    assert validate({"maxLength": 1}, astral * 2)
