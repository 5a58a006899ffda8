"""Property-based kernel invariants (hypothesis; pure Python, no Spark)."""

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkschema.spec.interpreter import Validator
from sparkschema.spec.jsonvalue import canonical, json_equal, json_type

json_values = st.recursive(
    st.none() | st.booleans() | st.integers(min_value=-10**12, max_value=10**12)
    | st.decimals(allow_nan=False, allow_infinity=False, places=6)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=12,
)

SCHEMAS = [
    True, False, {},
    {"type": "integer"}, {"type": ["string", "null"]},
    {"minimum": 0, "maximum": 100},
    {"minLength": 1, "maxLength": 5},
    {"pattern": "^a+$"},
    {"enum": [1, "a", [1, 2], {"k": True}]},
    {"items": {"type": "number"}, "minItems": 1, "uniqueItems": True},
    {"properties": {"a": {"type": "integer"}}, "required": ["a"],
     "additionalProperties": {"type": "string"}},
    {"allOf": [{"minimum": 0}, {"maximum": 10}]},
    {"anyOf": [{"type": "string"}, {"type": "number"}]},
    {"oneOf": [{"type": "integer"}, {"minLength": 2}]},
    {"not": {"type": "null"}},
    {"if": {"type": "number"}, "then": {"minimum": 0}, "else": {"minLength": 1}},
    {"format": "date-time"}, {"multipleOf": Decimal("0.5")},
    {"contains": {"const": 1}}, {"propertyNames": {"maxLength": 3}},
]


@settings(max_examples=300, deadline=None)
@given(json_values)
def test_validator_total_and_deterministic(value):
    """validate() never raises and is deterministic for any JSON value
    against every schema shape."""
    v = Validator()
    for schema in SCHEMAS:
        a = v.validate(schema, value)
        b = v.validate(schema, value)
        assert a == b
        for viol in a:
            assert viol.keyword and viol.msg


@settings(max_examples=300, deadline=None)
@given(json_values, json_values)
def test_canonical_equality_semantics(a, b):
    assert json_equal(a, a)
    if json_equal(a, b):
        assert canonical(a) == canonical(b)
        assert json_type(a) == json_type(b) or (
            json_type(a) == json_type(b) == "number")


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_boolean_schemas(value):
    v = Validator()
    assert v.validate(True, value) == []
    assert len(v.validate(False, value)) == 1
    # empty schema accepts everything (vacuous truth)
    assert v.validate({}, value) == []


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-1000, max_value=1000),
       st.integers(min_value=-1000, max_value=1000))
def test_min_max_consistency(value, bound):
    v = Validator()
    lo_ok = not v.validate({"minimum": bound}, value)
    hi_ok = not v.validate({"maximum": bound}, value)
    assert lo_ok == (value >= bound)
    assert hi_ok == (value <= bound)
    excl = not v.validate({"exclusiveMinimum": bound}, value)
    assert excl == (value > bound)


@given(st.decimals(allow_nan=False, allow_infinity=False))
def test_normalize_exact_preserves_value(d):
    """normalize_exact must be VALUE-preserving for every decimal — the
    property plain Decimal.normalize() violates beyond 28 significant
    digits (context rounding corrupted a 37-digit bound to 1E+20;
    fuzz-found r3)."""
    from sparkschema.spec.jsonvalue import normalize_exact
    n = normalize_exact(d)
    assert n == d
    # and idempotent / trailing-zero-free
    assert normalize_exact(n) == n
    if n != 0:
        assert n.as_tuple().digits[-1] != 0


@given(st.decimals(allow_nan=False, allow_infinity=False),
       st.decimals(allow_nan=False, allow_infinity=False))
def test_canonical_number_equality_is_exact(a, b):
    """Two decimals are canonical-equal iff numerically equal — at ANY
    precision (the old normalize()-based canon merged values differing
    past 28 digits)."""
    from sparkschema.spec.jsonvalue import canonical
    assert (canonical(a) == canonical(b)) == (a == b)
