"""Round-4 regressions (ADVICE r3):

1. multipleOf with a binary-representable mo of scale > 18 (e.g. 2^-20,
   scale 20) must be pathological for the VARIANT compiler — the vscale>18
   "never a multiple" tier only holds when scale(mo) <= 18.
2. DOUBLE-stored variants must never be captured by the decimal-window
   tiers (decimal(38,18) extraction ROUNDS the double before comparing) —
   minimum/maximum/type:integer on e-notation JSON route through the
   kernel-exact double branches.
3. e-notation differential lane: the old fuzz lanes render plain JSON
   only, so DOUBLE-stored variants were never fuzzed. This lane forces
   e-notation texts (always DOUBLE in VARIANT) and checks the verdict
   against the kernel on the double value.
"""

import math
import random

from pyspark.sql import functions as F

from sparkschema.compiler.variantcol import (VariantUnsupported,
                                             json_valid_auto,
                                             variant_valid_column)
from sparkschema.spec.interpreter import Validator

SEED = 20260817


def _verdicts(spark, texts, spec):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, j string")
    rows = df.select("i", variant_valid_column("j", spec).alias("ok")).collect()
    return {r.i: r.ok for r in rows}


def test_binary_multiple_of_scale_gt18_falls_back(spark):
    # 2^-20 is binary-representable but scale 20: the VARIANT compiler
    # must refuse (ADVICE r3: 3*2^-20 stored DECIMAL(20,20) was flagged)
    spec = {"multipleOf": 2 ** -20}
    try:
        variant_valid_column("j", spec)
        raise AssertionError("expected VariantUnsupported for scale-20 mo")
    except VariantUnsupported:
        pass

    # json_valid_auto falls back to the kernel and gets it right
    texts = ["0.00000286102294921875",     # 3 * 2^-20 — a multiple
             "0.00000286102294921876",     # not a multiple
             "0.0000028610229492187500"]   # trailing zeros, still a multiple
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, j string")
    got = {r.i: r.ok for r in
           df.select("i", json_valid_auto("j", spec).alias("ok")).collect()}
    assert got == {0: True, 1: False, 2: True}


def test_double_stored_variant_skips_decimal_tiers(spark):
    # ADVICE r3 repro: 9.999999999999998e-4 is DOUBLE-stored; its
    # decimal(38,18) extraction rounds to 0.001 and the old first tier
    # declared it >= 0.001
    got = _verdicts(spark, ["9.999999999999998e-4", "1.0000000000000002e-3",
                            "1e-3"],
                    {"minimum": 0.001})
    assert got == {0: False, 1: True, 2: True}

    # type:integer — 1e-19 extracted at scale 18 rounds to 0 and "was"
    # an integer
    got = _verdicts(spark, ["1e-19", "1e0", "1.5e0", "1e21"],
                    {"type": "integer"})
    assert got == {0: False, 1: True, 2: False, 3: True}

    # non-fits bound branches (|bound| >= 1e20): double-stored values must
    # reach the direction-aware double comparator, not the n_cmp constant
    got = _verdicts(spark, ["5e20", "2e21"], {"minimum": 10 ** 21})
    assert got == {0: False, 1: True}


def test_enotation_double_differential_fuzz(spark):
    """Seeded lane over DOUBLE-stored variants: e-notation texts force
    DOUBLE storage in VARIANT; the kernel verdict on the parsed double is
    the expectation (both sides see the identical IEEE value, so the
    documented e-notation parse divergence does not apply)."""
    rng = random.Random(SEED)
    kernel = Validator()

    vals = [9.999999999999998e-4, 1e-19, 1.0000000000000002, 0.001, 0.1,
            0.3, 0.25, 1e20, 1e21, 1e26, 5e20, float(2 ** 53),
            float(2 ** 53 + 2), -9.223372036854776e18, 2147483647.0,
            2147483648.0, -0.0, 7.0, -5.5, 0.30000000000000004,
            123456789012345678901.5]
    for _ in range(20):
        vals.append(rng.uniform(-1000, 1000))
        vals.append(rng.uniform(-1, 1) * 10.0 ** rng.randint(-25, 25))

    from decimal import Decimal
    specs = [{"minimum": 0.001}, {"maximum": 0.001}, {"minimum": 1},
             {"exclusiveMinimum": 0.3}, {"exclusiveMaximum": 0.1},
             {"minimum": 10 ** 21}, {"maximum": 10 ** 20},
             {"maximum": Decimal("0.99999999999999999999")},
             {"minimum": Decimal("123456789012345678901.5")},
             {"type": "integer"}, {"type": "number"},
             {"multipleOf": 1}, {"multipleOf": 0.25},
             {"multipleOf": Decimal("0.05")}, {"multipleOf": 2},
             {"const": 0.001}, {"const": 1e20}, {"enum": [0.1, 7, 1e26]},
             {"format": "int32"}, {"format": "int64"},
             {"minimum": 0, "maximum": 100, "multipleOf": 7},
             {"minimum": 7, "exclusiveMinimum": True}]
    for _ in range(10):
        kw = rng.choice(["minimum", "maximum", "exclusiveMinimum",
                         "exclusiveMaximum", "multipleOf", "const"])
        n = rng.choice(vals[:20])
        if kw == "multipleOf":
            n = abs(n) or 1.0
        specs.append({kw: n})

    texts = [f"{v:.17e}" for v in vals]  # always e-notation => DOUBLE
    assert all(float(t) == v for t, v in zip(texts, vals))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, j string")
    cols, live = [], []
    for j, spec in enumerate(specs):
        try:
            cols.append(variant_valid_column("j", spec).alias(f"v{j}"))
            live.append(j)
        except VariantUnsupported:
            pass
    got = {r.i: r for r in df.select("i", *cols).collect()}

    problems = []
    for j in live:
        for i, v in enumerate(vals):
            expected = not kernel.validate(specs[j], v)
            g = got[i][f"v{j}"]
            if bool(g) != expected:
                problems.append(f"spec={specs[j]} v={v!r} text={texts[i]}: "
                                f"got={g} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences, first 10:\n"
                          + "\n".join(problems[:10]))
