"""Regression tests for round-2 verdict/advice findings (round 3):

1. ADVICE high: const/enum of a non-dyadic fractional literal (0.1, 3.14)
   on a Double column must use the kernel's shortest-repr representability
   view, not the exact binary expansion (which is False for every such
   literal and flagged all rows).
2. VERDICT wrong #1: a lone ``{"type": "null"}`` must FAIL present values
   on the columnar path (it used to compile to a static pass). Full
   kernel-vs-columnar differential over the type matrix.
3. VERDICT wrong #2: VARIANT-path multipleOf gets the columnar overflow
   tiers — values outside decimal(38,12) (1e26, 2^53+1, 27-digit literals)
   agree with the kernel instead of NULLing into "invalid".
4. oneOf many-vs-none message parity across kernel and columnar paths.
"""

import json
import re
from decimal import Decimal

from pyspark.sql import functions as F

from sparkschema.compiler.columns import ColumnCompiler
from sparkschema.spec.interpreter import Validator
from sparkschema.spec.jsonvalue import parse_json

# ---------------------------------------------------------------------------
# 1. const/enum on double columns: shortest-repr representability

NONDYADIC = [0.1, 3.14, 0.3, 1.1, 2.675, -0.7, 1e-3, 0.123456789012345]


def test_const_nondyadic_on_double_column(spark):
    rows = [(i, v) for i, v in enumerate(NONDYADIC)]
    df = spark.createDataFrame(rows, "i int, x double")
    cc = ColumnCompiler()
    kernel = Validator()
    dt = df.schema["x"].dataType
    cols = [cc.compile_valid({"const": parse_json(repr(v))}, F.col("x"), dt)
            .alias(f"c{j}") for j, v in enumerate(NONDYADIC)]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    for i, v in enumerate(NONDYADIC):
        for j, c in enumerate(NONDYADIC):
            expected = not kernel.validate({"const": parse_json(repr(c))}, v)
            assert bool(got[i][f"c{j}"]) == expected, (
                f"const {c} on double {v}: columnar={got[i][f'c{j}']} "
                f"kernel={expected}")


def test_enum_nondyadic_on_double_column(spark):
    df = spark.createDataFrame([(1, 0.1), (2, 0.2), (3, 0.5)], "i int, x double")
    cc = ColumnCompiler()
    dt = df.schema["x"].dataType
    spec = {"enum": [parse_json("0.1"), parse_json("0.5")]}
    got = {r.i: r.ok for r in df.select(
        "i", cc.compile_valid(spec, F.col("x"), dt).alias("ok")).collect()}
    assert got == {1: True, 2: False, 3: True}


# ---------------------------------------------------------------------------
# 2. type-matrix differential: kernel vs columnar on every dtype

TYPE_SPECS = (
    [{"type": t} for t in
     ("null", "boolean", "string", "number", "integer", "array", "object")]
    + [{"type": u} for u in
       (["string", "null"], ["integer", "null"], ["number", "string"],
        ["boolean", "null"], ["array", "null"], ["object", "null"],
        ["null", "boolean"])]
)

TYPE_FIXTURES = [
    ("long", 5),
    ("double", 2.5),
    ("double", 3.0),          # integer-valued double: runtime integer check
    ("string", "x"),
    ("boolean", True),
    ("array<int>", [1]),
    ("map<string,int>", {"a": 1}),
    ("struct<a:int>", {"a": 1}),
]


def test_type_matrix_kernel_columnar_differential(spark):
    cc = ColumnCompiler()
    kernel = Validator()
    problems = []
    for dtype, value in TYPE_FIXTURES:
        df = spark.createDataFrame([(0, value), (1, None)], f"i int, x {dtype}")
        dt = df.schema["x"].dataType
        cols = [cc.compile_valid(s, F.col("x"), dt).alias(f"t{j}")
                for j, s in enumerate(TYPE_SPECS)]
        got = {r.i: r for r in df.select("i", *cols).collect()}
        for j, s in enumerate(TYPE_SPECS):
            expected = not kernel.validate(s, value)
            if bool(got[0][f"t{j}"]) != expected:
                problems.append(f"{s} on {dtype}={value!r}: "
                                f"columnar={got[0][f't{j}']} kernel={expected}")
            # SQL NULL models absence: every spec passes vacuously
            if got[1][f"t{j}"] is not None and not got[1][f"t{j}"]:
                problems.append(f"{s} on NULL {dtype}: not vacuous")
    assert not problems, "\n".join(problems)


def test_lone_type_null_flags_present_values(spark):
    # the r2 hole: this used to compile to NO check at all
    df = spark.createDataFrame([(1, 5), (2, None)], "i int, x int")
    cc = ColumnCompiler()
    got = {r.i: r.ok for r in df.select(
        "i", cc.compile_valid({"type": "null"}, F.col("x"),
                              df.schema["x"].dataType).alias("ok")).collect()}
    assert got[1] is False          # present value is never JSON null
    assert got[2] in (True, None)   # NULL passes vacuously


# ---------------------------------------------------------------------------
# 3. VARIANT multipleOf overflow tiers

MO_JSON_TEXTS = [
    "0", "3", "6", "7", "-9", "0.1", "0.2", "0.25", "0.75", "2.5", "3.0",
    "1234.56", "-0.3", "9007199254740992", "9007199254740993",
    "100000000000000000000000000",      # DECIMAL(27,0): exact, > decimal(38,12)
    "100000000000000000000000001",      # 10^26+1: odd, exact
    "5e33", "1e26", "1e-13", "1e40", "0.30000000000000004",
]
MO_FACTORS = [0.5, 0.25, 0.1, 0.01, 3, 2, 0.3, 1, 7]

_INT_RE = re.compile(r"^-?\d+$")
_PLAIN_DEC_RE = re.compile(r"^-?\d+\.\d+$")


def _variant_view(text: str):
    """The value as VARIANT parses it (probed on Spark 4.1): integer and
    plain-decimal literals are exact; e-notation becomes a double. The
    kernel twin must validate the SAME value — parse-level divergence for
    e-notation (1e26 exact-decimal vs double) is inherent and documented in
    variantcol._multiple_of_fail_variant."""
    if _INT_RE.match(text):
        return int(text)
    if _PLAIN_DEC_RE.match(text):
        return Decimal(text)
    return float(text)


def test_variant_multipleof_overflow_tiers(spark):
    from sparkschema.compiler.variantcol import variant_valid_column

    kernel = Validator()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(MO_JSON_TEXTS)],
                               "i int, js string")
    cols = [variant_valid_column("js", {"multipleOf": parse_json(json.dumps(m))})
            .alias(f"m{j}") for j, m in enumerate(MO_FACTORS)]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    problems = []
    for j, m in enumerate(MO_FACTORS):
        spec = {"multipleOf": parse_json(json.dumps(m))}
        for i, text in enumerate(MO_JSON_TEXTS):
            expected = not kernel.validate(spec, _variant_view(text))
            if bool(got[i][f"m{j}"]) != expected:
                problems.append(f"multipleOf {m} on {text}: "
                                f"variant={got[i][f'm{j}']} kernel={expected}")
    assert not problems, "\n".join(problems)


def test_variant_multipleof_randomized_double_parity(spark):
    """Seeded full-double-range sweep (r2 done-criterion): the VARIANT
    verdict equals the kernel's on every double-parsed JSON number."""
    import random

    from sparkschema.compiler.variantcol import variant_valid_column

    rng = random.Random(20260817)
    values = [0.0]
    for _ in range(200):
        mant = rng.uniform(1.0, 10.0) * (1 if rng.random() < 0.5 else -1)
        values.append(mant * 10.0 ** rng.randint(-300, 300))
    values += [float(rng.randint(-10**18, 10**18)) for _ in range(50)]
    values += [round(rng.uniform(-1000, 1000), 2) for _ in range(50)]
    texts = [repr(v) for v in values]

    kernel = Validator()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, js string")
    factors = [0.5, 0.1, 0.25, 3, 0.3, 7]
    cols = [variant_valid_column("js", {"multipleOf": parse_json(json.dumps(m))})
            .alias(f"m{j}") for j, m in enumerate(factors)]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    problems = []
    for j, m in enumerate(factors):
        spec = {"multipleOf": parse_json(json.dumps(m))}
        for i, text in enumerate(texts):
            expected = not kernel.validate(spec, _variant_view(text))
            if bool(got[i][f"m{j}"]) != expected:
                problems.append(f"mo={m} v={text}")
    assert not problems, f"{len(problems)} mismatches, first: {problems[:5]}"


def test_variant_const_enum_extreme_literals(spark):
    """r3 self-find: const/enum literals outside decimal(38,12) used to
    CRASH at plan time (ANSI overflow in constant folding) and out-of-range
    values NULLed instead of comparing. Tiered equality now mirrors
    _num_eq_lit, split by the variant's stored type."""
    from sparkschema.compiler.variantcol import variant_valid_column

    df = spark.createDataFrame(
        [(1, "1e26"), (2, "0.1"), (3, "100000000000000000000000000"),
         (4, "9007199254740993"), (5, "9007199254740992"), (6, "true")],
        "i int, j string")
    cols = [
        variant_valid_column("j", {"const": 1e26}).alias("c_big"),
        variant_valid_column("j", {"const": 0.1}).alias("c_01"),
        variant_valid_column("j", {"const": 9007199254740993}).alias("c_53"),
        variant_valid_column("j", {"enum": [0.1, 9007199254740993]}).alias("e"),
    ]
    got = {r.i: (r.c_big, r.c_01, r.c_53, r.e)
           for r in df.select("i", *cols).collect()}
    assert got[1] == (True, False, False, False)   # double 1e26 ≡ 1e26
    assert got[2] == (False, True, False, True)
    # the 27-digit exact decimal is NOT the double 1e26 (≠ exact binary)
    assert got[3] == (False, False, False, False)
    assert got[4] == (False, False, True, True)    # 2^53+1 exact BIGINT
    assert got[5] == (False, False, False, False)  # 2^53 ≠ 2^53+1
    assert got[6] == (False, False, False, False)  # true ≢ any number


def test_variant_numeric_keywords_outside_decimal_window(spark):
    """r3 review: minimum/maximum/exclusive*/type:integer/format:int64 used
    the decimal extraction directly, so values outside its window NULLed
    into 'invalid' (and poisoned oneOf counts) — same class as the
    multipleOf hole. Now tiered like multipleOf/const."""
    from sparkschema.compiler.variantcol import variant_valid_column

    df = spark.createDataFrame(
        [(1, "1e26"), (2, "100000000000000000000000000"),
         (3, "100000000000000000000000001"), (4, "5"), (5, "-1e26"),
         (6, "1e30"), (7, "123456789012345678901.5")],
        "i int, j string")
    cols = [
        variant_valid_column("j", {"minimum": 0}).alias("mn0"),
        variant_valid_column("j", {"maximum": 1e28}).alias("mx"),
        variant_valid_column("j", {"exclusiveMinimum": 1e27}).alias("emn"),
        variant_valid_column("j", {"type": "integer"}).alias("ti"),
        variant_valid_column("j", {"format": "int64"}).alias("i64"),
        variant_valid_column("j", {"oneOf": [{"minimum": 1e25},
                                             {"maximum": 0}]}).alias("oo"),
        variant_valid_column(
            "j", {"const": Decimal("123456789012345678901.5")}).alias("cw"),
    ]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    #            mn0    mx     emn    ti     i64    oo     cw
    assert tuple(got[1]) == (1, True, True, False, True, False, True, False)
    assert tuple(got[2]) == (2, True, True, False, True, False, True, False)
    assert tuple(got[3]) == (3, True, True, False, True, False, True, False)
    assert tuple(got[4]) == (4, True, True, False, True, True, False, False)
    assert tuple(got[5]) == (5, False, True, False, True, False, True, False)
    assert tuple(got[6]) == (6, True, False, True, True, False, True, False)
    # 21-int-digit decimal WITH fraction: exactly stored, const-equal,
    # not an integer (and 1.2e20 < 1e25 matches neither oneOf branch)
    assert tuple(got[7]) == (7, True, True, False, False, False, False, True)


def test_variant_object_keywords_native(spark):
    """r3 (VERDICT r2 #8): key-only object keywords compile VARIANT-native.
    The plan must contain no Python UDF node."""
    from sparkschema.compiler.variantcol import variant_valid_column

    spec = {"type": "object",
            "propertyNames": {"pattern": "^[a-z]+$", "maxLength": 4},
            "minProperties": 1, "maxProperties": 3,
            "dependencies": {"b": ["c"]}}
    df = spark.createDataFrame(
        [(1, '{"ab": 1}'), (2, '{}'), (3, '{"Toolong": 1}'),
         (4, '{"b": 1, "c": 2}'), (5, '{"b": 1}'),
         (6, '{"a":1,"b":2,"c":3,"d":4}'), (7, '{"BAD": 1}')],
        "i int, j string")
    col = variant_valid_column("j", spec)
    got = {r.i: r.ok for r in df.select("i", col.alias("ok")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True, 5: False,
                   6: False, 7: False}
    plan = df.select(col.alias("ok"))._jdf.queryExecution() \
             .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan

    # additionalProperties=false over declared properties
    spec2 = {"properties": {"x": {"type": "integer"}},
             "additionalProperties": False}
    df2 = spark.createDataFrame(
        [(1, '{"x": 1}'), (2, '{"x": 1, "y": 2}'), (3, '{}')],
        "i int, j string")
    got2 = {r.i: r.ok for r in df2.select(
        "i", variant_valid_column("j", spec2).alias("ok")).collect()}
    assert got2 == {1: True, 2: False, 3: True}


# ---------------------------------------------------------------------------
# 4. oneOf none-vs-many message parity

def test_oneof_many_message_parity(spark):
    spec = {"oneOf": [{"minimum": 0}, {"maximum": 10}]}
    kernel = Validator()
    # 5 matches both branches -> many; -1 matches only maximum -> pass;
    # no value can match neither here, so add a disjoint spec for none
    many_msg = kernel.validate(spec, 5)[0].msg
    assert "more than one" in many_msg

    cc = ColumnCompiler()
    df = spark.createDataFrame([(1, 5), (2, -1)], "i int, x int")
    checks = cc.compile_checks(spec, F.col("x"), df.schema["x"].dataType, "#", "")
    (chk,) = [c for c in checks if c.keyword == "oneOf"]
    got = {r.i: (r.fail, r.msg) for r in
           df.select("i", chk.fail.alias("fail"), chk.msg.alias("msg")).collect()}
    assert got[1][0] is True and got[1][1] == many_msg
    assert got[2][0] is False

    none_spec = {"oneOf": [{"minimum": 100}, {"maximum": -100}]}
    none_msg = kernel.validate(none_spec, 5)[0].msg
    assert none_msg != many_msg
    checks2 = cc.compile_checks(none_spec, F.col("x"),
                                df.schema["x"].dataType, "#", "")
    (chk2,) = [c for c in checks2 if c.keyword == "oneOf"]
    row = df.where("i = 1").select(chk2.fail.alias("f"), chk2.msg.alias("m")) \
            .collect()[0]
    assert row.f is True and row.m == none_msg
