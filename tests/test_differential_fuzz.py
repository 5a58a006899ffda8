"""Seeded three-path differential fuzz: for random scalar specs and random
JSON values, the kernel (interpreter), the VARIANT compiler, and the
columnar compiler must agree on the verdict.

Domain notes (documented parse-level divergences excluded by construction):
- JSON texts use plain int/decimal renderings, never e-notation (VARIANT
  parses e-notation as double while the kernel keeps the exact decimal —
  a documented divergence, tested separately in test_round3_fixes);
- the columnar path sees the value through a typed column, so each value
  routes to the column of its own JSON type; columnar NULL = absence
  semantics are asserted separately (type-matrix test).
"""

import json
import random
from decimal import Decimal

from pyspark.sql import functions as F

from sparkschema.compiler.columns import ColumnCompiler
from sparkschema.spec.interpreter import Validator
from sparkschema.spec.jsonvalue import parse_json

SEED = 20261008


def _gen_values(rng: random.Random) -> list:
    vals = [0, 1, -1, 7, 50, 2**31, 2**53, 2**53 + 1, -(2**63) + 1,
            10**20, 10**26, 10**26 + 1,
            Decimal("0.1"), Decimal("0.25"), Decimal("0.3"),
            Decimal("123456789012345678901.5"), Decimal("-0.05"),
            # r3 hostile tail: scale-30 / scale-18 / prec-37 decimals that
            # exposed the context-normalize and extraction-rounding bugs
            Decimal("1E-30"), Decimal("1.000000000000000001"),
            Decimal("-5E-16"),
            Decimal("99999999999999999999.99999999999999999"),
            # scale-19..38 near-boundary values (review find r3b: the
            # double view declared 0.9...9 (20 nines) >= 1)
            Decimal("0.99999999999999999999"),
            Decimal("-0.99999999999999999999"),
            Decimal("1.0000000000000000000000000000000000001"),
            Decimal("6.9999999999999999999999999"),
            "", "a", "hello world", "Ab9", "café", "x" * 40,
            # r4 hostile grapheme tails (legacy BreakIterator rules):
            # jamo runs, Devanagari clusters, mark gating — exercises
            # minLength/maxLength across kernel / columnar / VARIANT
            "\u1100\u1160\u11a8",            # L+V+T: ONE cluster
            "\uac00\u11a8",                   # precomposed LV + T: TWO
            "\u1160\u1100\u1160",            # V+L+V: V, then LV run
            "\u0915\u094d\u0915\u093e",     # dev conjunct + vowel: ONE
            "a\u0301\u0301b",                 # chained marks: 2 clusters
            "\t\u0301",                       # no fold after control: 2
            "x\u0903",                         # Mc never folds: 2
            "a\r\nb\u1100\u11ff",           # CRLF + L+T glue
            True, False, None]
    for _ in range(15):
        vals.append(rng.randint(-10**6, 10**6))
        vals.append(Decimal(str(round(rng.uniform(-1000, 1000), 3))))
    for _ in range(5):
        vals.append("".join(rng.choice("abcXYZ019 .-") for _ in range(rng.randint(0, 12))))
    return vals


def _gen_specs(rng: random.Random) -> list[dict]:
    specs = []
    nums = [0, 1, 3, 7, -5, 0.5, 0.25, 0.1, 2**53, 10**20, 10**26,
            Decimal("0.05"), Decimal("123456789012345678901.5")]
    for _ in range(25):
        kw = rng.choice(["minimum", "maximum", "exclusiveMinimum",
                         "exclusiveMaximum", "multipleOf"])
        n = rng.choice(nums)
        if kw == "multipleOf" and (not n or (isinstance(n, (int, Decimal)) and n <= 0)):
            n = abs(n) or 1
        specs.append({kw: n})
    for _ in range(10):
        specs.append({"const": rng.choice(nums + ["a", "café", True, None])})
        pool = rng.sample(nums + ["a", "hello world", True, False], 3)
        specs.append({"enum": pool})
    for _ in range(8):
        specs.append({rng.choice(["minLength", "maxLength"]): rng.randint(0, 8)})
    for t in ("integer", "number", "string", "boolean", "null",
              ["integer", "null"], ["string", "boolean"]):
        specs.append({"type": t})
    specs += [{"multipleOf": 10**20}, {"multipleOf": 10**26},
              {"multipleOf": Decimal("0.0000000000000000001")},  # scale 19
              # prec-37 bound: Decimal.normalize() context-rounded it to
              # 1E+20 across six compile paths (fuzz-found r3)
              {"maximum": Decimal("99999999999999999999.99999999999999999")},
              {"exclusiveMinimum":
               Decimal("99999999999999999999.99999999999999999")},
              {"const": Decimal("99999999999999999999.99999999999999999")},
              {"multipleOf":
               Decimal("99999999999999999999.99999999999999999")},
              {"minimum": 1}, {"maximum": Decimal("0.99999999999999999999")},
              {"exclusiveMaximum": 7}, {"multipleOf": 1},
              {"format": "int32"}, {"format": "int64"},
              {"pattern": "^[a-z]+$"}, {"pattern": "9"},
              {"minimum": 0, "maximum": 100, "multipleOf": 7},
              # draft-4 boolean exclusive flags (flag-form, not number-form)
              {"minimum": 7, "exclusiveMinimum": True},
              {"maximum": 50, "exclusiveMaximum": True},
              {"minimum": Decimal("0.5"), "exclusiveMinimum": True,
               "maximum": 2**53, "exclusiveMaximum": True},
              {"anyOf": [{"minimum": 100}, {"maximum": 0}]},
              {"oneOf": [{"minimum": 0}, {"maximum": 10}]},
              {"not": {"type": "string"}},
              {"if": {"minimum": 0}, "then": {"multipleOf": 2},
               "else": {"maximum": -5}},
              {"allOf": [{"minimum": 0}, {"maximum": 10**21}]}]
    return specs


def _plain_json(v) -> str:
    """Plain (never e-notation) JSON text so VARIANT and the kernel parse
    the same exact value."""
    if isinstance(v, Decimal):
        return format(v, "f")
    return json.dumps(v)


def test_three_path_differential_fuzz(spark):
    rng = random.Random(SEED)
    values = _gen_values(rng)
    specs = _gen_specs(rng)
    kernel = Validator()
    cc = ColumnCompiler()

    texts = [_plain_json(v) for v in values]
    rows = []
    for i, v in enumerate(values):
        num = ln = dc = None
        if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
            num = float(v)
            if isinstance(v, int) and -2**63 <= v < 2**63:
                ln = v
            dd = Decimal(v)
            scale = max(-dd.as_tuple().exponent, 0)
            if scale <= 18 and len(dd.as_tuple().digits) - scale <= 20:
                dc = dd  # exactly representable at decimal(38,18)
        rows.append((i, texts[i],
                     num, ln, dc,
                     v if isinstance(v, str) else None,
                     v if isinstance(v, bool) else None))
    df = spark.createDataFrame(
        rows,
        "i int, js string, d double, ln long, dc decimal(38,18), "
        "s string, b boolean")

    from sparkschema.compiler.variantcol import VariantUnsupported, variant_valid_column
    vcols, ccols, vspecs = [], [], []
    for j, spec in enumerate(specs):
        try:
            vcols.append(variant_valid_column("js", spec).alias(f"v{j}"))
            vspecs.append(j)
        except VariantUnsupported:
            pass
        ccols.append(cc.compile_valid(spec, F.col("d"),
                                      df.schema["d"].dataType).alias(f"cd{j}"))
        ccols.append(cc.compile_valid(spec, F.col("s"),
                                      df.schema["s"].dataType).alias(f"cs{j}"))
        ccols.append(cc.compile_valid(spec, F.col("ln"),
                                      df.schema["ln"].dataType).alias(f"cl{j}"))
        ccols.append(cc.compile_valid(spec, F.col("dc"),
                                      df.schema["dc"].dataType).alias(f"cc{j}"))
    got = {r.i: r for r in df.select("i", "ln", "dc", *vcols, *ccols).collect()}

    problems = []
    for j, spec in enumerate(specs):
        for i, v in enumerate(values):
            expected = not kernel.validate(spec, v)
            # VARIANT path sees the full JSON value
            if j in vspecs:
                gv = got[i][f"v{j}"]
                if bool(gv) != expected:
                    problems.append(f"VARIANT spec={spec} v={v!r}: "
                                    f"got={gv} kernel={expected}")
            # columnar: route the value to the column of its JSON type.
            # The double column's view of a number is float(v) — compare
            # the kernel on THAT value (the typed-column model collapses
            # wide decimals to doubles by construction).
            if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
                dv = float(v)
                exp_d = not kernel.validate(spec, dv)
                gd = got[i][f"cd{j}"]
                if bool(gd) != exp_d:
                    problems.append(f"COLUMNAR(double) spec={spec} v={dv!r}: "
                                    f"got={gd} kernel={exp_d}")
            elif isinstance(v, str):
                gs = got[i][f"cs{j}"]
                if bool(gs) != expected:
                    problems.append(f"COLUMNAR(string) spec={spec} v={v!r}: "
                                    f"got={gs} kernel={expected}")
            # long / decimal(38,18) lanes hold v EXACTLY when populated —
            # the kernel's verdict on v itself is the expectation
            if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
                if got[i]["ln"] is not None:
                    gl = got[i][f"cl{j}"]
                    if bool(gl) != expected:
                        problems.append(f"COLUMNAR(long) spec={spec} v={v!r}: "
                                        f"got={gl} kernel={expected}")
                if got[i]["dc"] is not None:
                    gc = got[i][f"cc{j}"]
                    if bool(gc) != expected:
                        problems.append(
                            f"COLUMNAR(decimal) spec={spec} v={v!r}: "
                            f"got={gc} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences, first 10:\n"
                          + "\n".join(problems[:10]))


def test_ref_chain_inlining_fuzz(spark):
    """Random $ref chains (definitions graphs wrapped in combinators):
    the compile-time inliner + columnar compiler must agree with the
    registry-backed kernel."""
    from sparkschema.compiler.table import inline_refs
    from sparkschema.spec.refs import RefResolver, Scope
    from sparkschema.spec.registry import SpecRegistry

    rng = random.Random(SEED + 9)
    values = [0, 1, 5, 7, 49, 50, 100, -3]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i int, ln long")
    cc = ColumnCompiler()
    problems = []
    for trial in range(30):
        leaf = rng.choice([{"minimum": rng.randint(0, 50)},
                           {"maximum": rng.randint(0, 50)},
                           {"multipleOf": rng.choice([2, 7])},
                           {"enum": [1, 5, 50]}])
        defs = {"d0": leaf}
        depth = rng.randint(1, 3)
        for lvl in range(1, depth + 1):
            inner = {"$ref": f"#/definitions/d{lvl-1}"}
            defs[f"d{lvl}"] = rng.choice([
                inner,
                {"allOf": [inner, {"minimum": -100}]},
                {"anyOf": [inner, {"const": -999}]},
                {"not": {"not": inner}},
                {"oneOf": [inner]},
            ])
        spec = {"definitions": defs, "$ref": f"#/definitions/d{depth}"}
        reg = SpecRegistry("draft7")
        uri = f"urn:fuzz:{trial}"
        reg.index.add_document(uri, spec, "draft7")
        inlined = inline_refs(spec, RefResolver(reg.index, "draft7"),
                              Scope(spec, uri))
        col = cc.compile_valid(inlined, F.col("ln"),
                               df.schema["ln"].dataType)
        got = {r.i: r.ok for r in df.select("i", col.alias("ok")).collect()}
        for i, v in enumerate(values):
            expected = not reg.validate(spec, v)
            if bool(got[i]) != expected:
                problems.append(f"spec={spec} v={v}: got={got[i]} "
                                f"kernel={expected}")
    assert not problems, "\n".join(problems[:8])


def test_map_column_object_keyword_fuzz(spark):
    """Columnar map<string,T> object keywords vs the kernel over random
    objects — the typed-column twin of the VARIANT compound fuzz. NULL
    maps are excluded by construction (columnar NULL models ABSENT, not
    JSON null — SURVEY §1.4)."""
    rng = random.Random(SEED + 3)
    keys = ["a", "b", "c", "ab", "zz_weird", "a b", "é", "", "k9", "x.y"]
    int_maps, str_maps = [], []
    for _ in range(28):
        n = rng.randint(0, 5)
        int_maps.append({rng.choice(keys): rng.choice(
            [0, 1, -1, 7, 50, 10**6, -(2**31)]) for _ in range(n)})
        str_maps.append({rng.choice(keys): rng.choice(
            ["", "x", "abc", "Zz9", "café", "hello world"])
            for _ in range(n)})
    # {"ab": 50} pins the schema-form dependency gap (a singleton map
    # where the dep schema requires minProperties 2 — fresh-seed find)
    int_maps += [{}, {"a": 0, "b": 1}, {"a b": 5}, {"": 3}, {"ab": 50}]
    str_maps += [{}, {"a": ""}, {"é": "é"}, {"b": "B"}, {"ab": "x"}]

    int_specs = [
        {"type": "object", "required": ["a", "a b"]},
        {"properties": {"a": {"minimum": 1}, "b": {"multipleOf": 7}}},
        {"minProperties": 1, "maxProperties": 3},
        {"propertyNames": {"pattern": "^[a-z]+$"}},
        {"propertyNames": {"minLength": 1, "maxLength": 2}},
        {"patternProperties": {"^[ab]": {"minimum": 0},
                               "9$": {"maximum": 10}}},
        {"properties": {"a": {}}, "patternProperties": {"^b": {}},
         "additionalProperties": False},
        {"properties": {"a": {}}, "additionalProperties": {"maximum": 5}},
        {"additionalProperties": {"format": "int32", "minimum": -100}},
        {"dependencies": {"a": ["b", "c"]}},
        {"dependencies": {"ab": {"minProperties": 2}}},
        {"anyOf": [{"required": ["a"]}, {"maxProperties": 1}]},
        {"not": {"required": ["zz_weird"]}},
        {"if": {"required": ["a"]}, "then": {"required": ["b"]},
         "else": {"maxProperties": 2}},
        {"enum": [{}, {"a": 1}]},
        {"const": {"a": 0, "b": 1}},
    ]
    str_specs = [
        {"properties": {"a": {"minLength": 1}},
         "patternProperties": {"^[ab]$": {"pattern": "^[a-z]*$"}}},
        {"additionalProperties": {"maxLength": 5}},
        {"propertyNames": {"pattern": "\\w"}},
        {"patternProperties": {"é": {"const": "é"}}},
        {"dependencies": {"a": "b"}},
    ]

    kernel = Validator()
    cc = ColumnCompiler()
    rows = [(i, im, sm) for i, (im, sm) in
            enumerate(zip(int_maps, str_maps))]
    df = spark.createDataFrame(
        rows, "i int, im map<string,long>, sm map<string,string>")
    cols = []
    for j, s in enumerate(int_specs):
        cols.append(cc.compile_valid(s, F.col("im"),
                                     df.schema["im"].dataType).alias(f"i{j}"))
    for j, s in enumerate(str_specs):
        cols.append(cc.compile_valid(s, F.col("sm"),
                                     df.schema["sm"].dataType).alias(f"t{j}"))
    got = {r.i: r for r in df.select("i", *cols).collect()}

    problems = []
    for lane, specs, maps in (("i", int_specs, int_maps),
                              ("t", str_specs, str_maps)):
        for j, spec in enumerate(specs):
            for i in range(len(maps)):
                value = maps[i]
                expected = not kernel.validate(spec, value)
                g = got[i][f"{lane}{j}"]
                if bool(g) != expected:
                    problems.append(f"map({lane}) spec={spec} v={value!r}: "
                                    f"got={g} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences:\n"
                          + "\n".join(problems[:12]))


def test_random_object_spec_fuzz(spark):
    """RANDOM object specs (not a fixed list) × random maps, dual-path:
    columnar map<string,long> AND VARIANT vs the kernel — this generator
    found the silently-skipped schema-form map dependencies."""
    rng = random.Random(SEED + 6)
    keys = ["a", "b", "c", "ab", "k9", "zz", "a b", ""]

    def leaf():
        return rng.choice([
            {"minimum": rng.randint(-5, 5)}, {"maximum": rng.randint(-5, 50)},
            {"multipleOf": rng.choice([2, 3, 7])},
            {"enum": rng.sample([0, 1, 2, 5, 50], 2)},
            {"const": rng.choice([0, 1, 50])},
            {"type": "integer"}, {"format": "int32"},
            True, False, {}])

    def gen_spec(depth=2):
        spec = {}
        if rng.random() < 0.5:
            spec["properties"] = {k: leaf()
                                  for k in rng.sample(keys, rng.randint(1, 3))}
        if rng.random() < 0.4:
            spec["required"] = rng.sample(keys, rng.randint(1, 2))
        if rng.random() < 0.4:
            spec["patternProperties"] = {
                rng.choice(["^a", "b$", "[0-9]", "^$", "^[ak]"]): leaf()}
        if rng.random() < 0.4:
            spec["additionalProperties"] = rng.choice([False, leaf()])
        if rng.random() < 0.3:
            spec["minProperties"] = rng.randint(0, 3)
        if rng.random() < 0.3:
            spec["maxProperties"] = rng.randint(0, 4)
        if rng.random() < 0.3:
            spec["propertyNames"] = rng.choice(
                [{"maxLength": rng.randint(0, 2)}, {"pattern": "^[a-z]+$"},
                 {"minLength": 1}])
        if rng.random() < 0.4:
            spec["dependencies"] = {rng.choice(keys): rng.choice(
                [rng.sample(keys, 1), rng.choice(keys),
                 {"minProperties": rng.randint(1, 3)},
                 {"required": rng.sample(keys, 1)}, False])}
        if depth > 0 and rng.random() < 0.3:
            comb = rng.choice(["allOf", "anyOf", "oneOf", "not"])
            if comb == "not":
                spec["not"] = gen_spec(depth - 1)
            else:
                spec[comb] = [gen_spec(depth - 1)
                              for _ in range(rng.randint(1, 2))]
        return spec or {"minProperties": 0}

    specs = [gen_spec() for _ in range(40)]
    values = [{rng.choice(keys): rng.choice([0, 1, 2, 5, 50, -3])
               for _ in range(rng.randint(0, 4))} for _ in range(30)] \
        + [{}, {"a": 1}, {"ab": 50}]

    from sparkschema.compiler.variantcol import (VariantUnsupported,
                                                 variant_valid_column)
    kernel = Validator()
    cc = ColumnCompiler()
    df = spark.createDataFrame(
        [(i, v, json.dumps(v, ensure_ascii=False))
         for i, v in enumerate(values)],
        "i int, m map<string,long>, js string")
    cols, vok = [], set()
    for j, spec in enumerate(specs):
        cols.append(cc.compile_valid(spec, F.col("m"),
                                     df.schema["m"].dataType).alias(f"c{j}"))
        try:
            cols.append(variant_valid_column("js", spec).alias(f"v{j}"))
            vok.add(j)
        except VariantUnsupported:
            pass
    got = {}
    for b in range(0, len(cols), 30):  # batch: one giant select OOMs codegen
        for r in df.select("i", *cols[b:b + 30]).collect():
            got.setdefault(r.i, {}).update(r.asDict())
    problems = []
    for j, spec in enumerate(specs):
        for i, v in enumerate(values):
            expected = not kernel.validate(spec, v)
            if bool(got[i][f"c{j}"]) != expected:
                problems.append(f"MAP spec={spec} v={v!r}: "
                                f"got={got[i][f'c{j}']} kernel={expected}")
            if j in vok and bool(got[i][f"v{j}"]) != expected:
                problems.append(f"VARIANT spec={spec} v={v!r}: "
                                f"got={got[i][f'v{j}']} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences:\n"
                          + "\n".join(problems[:10]))


def test_struct_column_object_keyword_fuzz(spark):
    """Struct-column object keywords vs the kernel: a NULL field models
    the absent property, so the kernel sees the dict of NON-NULL fields.
    min/maxProperties, propertyNames, patternProperties,
    additionalProperties, and dependencies compile statically over the
    fixed field set (r3b)."""
    rng = random.Random(SEED + 4)
    rows = []
    for i in range(30):
        a = rng.choice([None, 0, 1, 7, -5, 50])
        b = rng.choice([None, 0, 2, 9])
        zz = rng.choice([None, "x", "abc", "hello world", ""])
        rows.append((i, (a, b, zz)))
    df = spark.createDataFrame(
        rows, "i int, st struct<a:long, b:long, zz_weird:string>")

    specs = [
        {"minProperties": 1}, {"minProperties": 2, "maxProperties": 2},
        {"maxProperties": 0},
        {"propertyNames": {"maxLength": 2}},
        {"propertyNames": {"pattern": "^[ab]$"}},
        {"propertyNames": False},
        {"patternProperties": {"^[ab]$": {"minimum": 1}}},
        {"patternProperties": {"weird": {"minLength": 2}}},
        {"properties": {"a": {}}, "additionalProperties": False},
        {"properties": {"a": {}}, "patternProperties": {"^b": {}},
         "additionalProperties": False},
        {"properties": {"a": {}, "b": {}},
         "additionalProperties": {"minLength": 3}},
        {"dependencies": {"a": ["b"]}},
        {"dependencies": {"a": "b"}},
        {"dependencies": {"b": "nope"}},
        {"dependencies": {"a": {"minProperties": 2}}},
        {"required": ["a"], "minProperties": 1},
        {"anyOf": [{"required": ["a"]}, {"maxProperties": 1}]},
    ]
    kernel = Validator()
    cc = ColumnCompiler()
    cols = [cc.compile_valid(s, F.col("st"),
                             df.schema["st"].dataType).alias(f"s{j}")
            for j, s in enumerate(specs)]
    got = {r.i: r for r in df.select("i", *cols).collect()}

    problems = []
    fieldnames = ["a", "b", "zz_weird"]
    for j, spec in enumerate(specs):
        for i, tup in rows:
            value = {k: v for k, v in zip(fieldnames, tup) if v is not None}
            expected = not kernel.validate(spec, value)
            g = got[i][f"s{j}"]
            if bool(g) != expected:
                problems.append(f"struct spec={spec} v={value!r}: "
                                f"got={g} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences:\n"
                          + "\n".join(problems[:12]))


def test_array_of_struct_items_fuzz(spark):
    """array<struct> columns: the struct object keywords (r3b) must
    compose with items/tuple/contains/uniqueItems through compile_valid
    recursion — kernel sees a list of non-null-field dicts."""
    rng = random.Random(SEED + 5)
    rows = []
    for i in range(25):
        n = rng.randint(0, 4)
        arr = [(rng.choice([None, 0, 1, 7]), rng.choice([None, "x", "abc"]))
               for _ in range(n)]
        rows.append((i, arr))
    df = spark.createDataFrame(rows, "i int, arr array<struct<a:long, b:string>>")
    specs = [
        {"items": {"required": ["a"]}},
        {"items": {"properties": {"a": {"minimum": 1}}, "minProperties": 1}},
        {"items": {"dependencies": {"b": ["a"]}}, "minItems": 1},
        {"contains": {"properties": {"b": {"minLength": 2}},
                      "required": ["b"]}},
        {"items": [{"required": ["a"]}, {"maxProperties": 1}],
         "additionalItems": {"minProperties": 1}},
        {"items": {"additionalProperties": False, "properties": {"a": {}}}},
        {"uniqueItems": True},
    ]
    kernel = Validator()
    cc = ColumnCompiler()
    cols = [cc.compile_valid(s, F.col("arr"),
                             df.schema["arr"].dataType).alias(f"s{j}")
            for j, s in enumerate(specs)]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    problems = []
    for j, spec in enumerate(specs):
        for i, arr in rows:
            value = [{k: v for k, v in zip(("a", "b"), t) if v is not None}
                     for t in arr]
            expected = not kernel.validate(spec, value)
            if bool(got[i][f"s{j}"]) != expected:
                problems.append(f"spec={spec} v={value!r}: "
                                f"got={got[i][f's{j}']} kernel={expected}")
    assert not problems, "\n".join(problems[:10])


def test_struct_keyword_attribution_parity(spark):
    """Violated-keyword SETS on struct columns vs the kernel: the r3b
    static object-keyword compile must attribute like the interpreter
    (patternProperties recurse to INNER keywords, additionalProperties /
    propertyNames / dependencies report their own)."""
    rows = []
    vals = [None, 0, 1, 7, 50, -2]
    svals = [None, "", "x", "abc"]
    rng = random.Random(SEED + 7)
    for i in range(25):
        rows.append((i, (rng.choice(vals), rng.choice(vals),
                         rng.choice(svals))))
    df = spark.createDataFrame(
        rows, "i int, st struct<a:long, b:long, zz_weird:string>")
    specs = [
        {"minProperties": 2, "maxProperties": 2},
        {"propertyNames": {"maxLength": 2}, "required": ["a"]},
        {"patternProperties": {"^[ab]$": {"minimum": 1, "multipleOf": 7}}},
        {"properties": {"a": {"maximum": 5}}, "additionalProperties": False},
        {"properties": {"a": {}, "b": {}},
         "additionalProperties": {"minLength": 2}},
        {"dependencies": {"a": ["b"], "zz_weird": {"minProperties": 3}}},
    ]
    kernel = Validator()
    cc = ColumnCompiler()
    sel = []
    for j, spec in enumerate(specs):
        checks = cc.compile_checks(spec, F.col("st"),
                                   df.schema["st"].dataType, "#", "")
        arr = F.array(*[F.when(F.coalesce(c.fail, F.lit(False)),
                               F.lit(c.keyword)) for c in checks]) \
            if checks else F.lit([]).cast("array<string>")
        sel.append(F.array_sort(F.array_distinct(
            F.filter(arr, lambda x: x.isNotNull()))).alias(f"k{j}"))
    got = {r.i: r for r in df.select("i", *sel).collect()}
    problems = []
    for j, spec in enumerate(specs):
        for i, tup in rows:
            value = {k: v for k, v in zip(("a", "b", "zz_weird"), tup)
                     if v is not None}
            expected = sorted({viol.keyword
                               for viol in kernel.validate(spec, value)})
            g = sorted(got[i][f"k{j}"])
            if g != expected:
                problems.append(f"spec={spec} v={value!r}: cols={g} "
                                f"kernel={expected}")
    assert not problems, (f"{len(problems)} attribution mismatches:\n"
                          + "\n".join(problems[:10]))


def test_map_keyword_attribution_parity(spark):
    """Violated-keyword SETS on map columns vs the kernel: r3b upgraded
    patternProperties / schema-form additionalProperties from a coarse
    umbrella check to one check per INNER keyword (exists over matching
    entries), matching the kernel/reference recursion."""
    rng = random.Random(SEED + 8)
    keys = ["a", "b", "ab", "zz", "k9"]
    values = [{rng.choice(keys): rng.choice([0, 1, 7, 50, -2])
               for _ in range(rng.randint(0, 4))} for _ in range(25)]
    values += [{}, {"a": 1}, {"zz": -2, "k9": 50}]
    specs = [
        {"patternProperties": {"^[ab]": {"minimum": 1, "multipleOf": 7}}},
        {"patternProperties": {"9$": {"enum": [1, 2]}, "^z": {"maximum": 5}}},
        {"properties": {"a": {}}, "additionalProperties": {"minimum": 0,
                                                           "const": 1}},
        {"additionalProperties": False, "properties": {"a": {"maximum": 5}}},
        {"patternProperties": {"^a": False}},
        {"propertyNames": {"pattern": "^[a-z]$", "maxLength": 2}},
        {"propertyNames": False},
    ]
    kernel = Validator()
    cc = ColumnCompiler()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i int, m map<string,long>")
    sel = []
    for j, spec in enumerate(specs):
        checks = cc.compile_checks(spec, F.col("m"),
                                   df.schema["m"].dataType, "#", "")
        arr = F.array(*[F.when(F.coalesce(c.fail, F.lit(False)),
                               F.lit(c.keyword)) for c in checks]) \
            if checks else F.lit([]).cast("array<string>")
        sel.append(F.array_sort(F.array_distinct(
            F.filter(arr, lambda x: x.isNotNull()))).alias(f"k{j}"))
    got = {r.i: r for r in df.select("i", *sel).collect()}
    problems = []
    for j, spec in enumerate(specs):
        for i, v in enumerate(values):
            expected = sorted({viol.keyword
                               for viol in kernel.validate(spec, v)})
            g = sorted(got[i][f"k{j}"])
            if g != expected:
                problems.append(f"spec={spec} v={v!r}: cols={g} "
                                f"kernel={expected}")
    assert not problems, (f"{len(problems)} attribution mismatches:\n"
                          + "\n".join(problems[:10]))


def test_keyword_attribution_parity_fuzz(spark):
    """Beyond verdicts: the SET of violated keywords per value must match
    the kernel's attribution (the error-report contract) on every typed
    lane — multi-keyword specs so several can fire at once."""
    rng = random.Random(SEED + 2)
    values = _gen_values(rng)
    specs = [
        {"minimum": 10, "maximum": 5, "multipleOf": 3},
        {"minimum": 0, "multipleOf": 7, "format": "int32"},
        {"type": "integer", "minimum": 2},
        {"type": "string", "minLength": 2},
        {"minLength": 2, "maxLength": 4, "pattern": "^[a-z]+$"},
        {"pattern": "9", "maxLength": 1, "format": "ipv4"},
        {"const": 5, "minimum": 3},
        {"enum": [1, 2], "multipleOf": 2},
        {"exclusiveMinimum": 3, "exclusiveMaximum": 10},
        {"format": "int64", "maximum": 2 ** 53},
        {"minimum": Decimal("0.5"), "multipleOf": Decimal("0.25")},
        {"type": ["integer", "null"], "maximum": 100},
    ]
    kernel = Validator()
    cc = ColumnCompiler()

    rows = []
    for i, v in enumerate(values):
        num = ln = dc = None
        if isinstance(v, (int, Decimal)) and not isinstance(v, bool):
            num = float(v)
            if isinstance(v, int) and -2**63 <= v < 2**63:
                ln = v
            dd = Decimal(v)
            sc = max(-dd.as_tuple().exponent, 0)
            if sc <= 18 and len(dd.as_tuple().digits) - sc <= 20:
                dc = dd
        rows.append((i, num, ln, dc, v if isinstance(v, str) else None))
    df = spark.createDataFrame(
        rows, "i int, d double, ln long, dc decimal(38,18), s string")

    sel = []
    for j, spec in enumerate(specs):
        for lane in ("d", "ln", "dc", "s"):
            checks = cc.compile_checks(spec, F.col(lane),
                                       df.schema[lane].dataType, "#", "")
            if checks:
                arr = F.array(*[F.when(F.coalesce(c.fail, F.lit(False)),
                                       F.lit(c.keyword)) for c in checks])
                fired = F.array_sort(F.array_distinct(
                    F.filter(arr, lambda x: x.isNotNull())))
            else:
                fired = F.lit([]).cast("array<string>")
            sel.append(fired.alias(f"k{j}_{lane}"))
    got = {r.i: r for r in df.select("i", "ln", "dc", *sel).collect()}

    problems = []
    for j, spec in enumerate(specs):
        for i, v in enumerate(values):
            for lane in ("d", "ln", "dc", "s"):
                if lane == "d":
                    if not (isinstance(v, (int, Decimal))
                            and not isinstance(v, bool)):
                        continue
                    kv = float(v)
                elif lane == "ln":
                    if got[i]["ln"] is None or not isinstance(v, int) \
                            or isinstance(v, bool):
                        continue
                    kv = v
                elif lane == "dc":
                    if got[i]["dc"] is None or not (
                            isinstance(v, (int, Decimal))
                            and not isinstance(v, bool)):
                        continue
                    kv = v
                else:
                    if not isinstance(v, str):
                        continue
                    kv = v
                expected = sorted({viol.keyword
                                   for viol in kernel.validate(spec, kv)})
                g = sorted(got[i][f"k{j}_{lane}"])
                if g != expected:
                    problems.append(f"{lane} spec={spec} v={kv!r}: "
                                    f"cols={g} kernel={expected}")
    assert not problems, (f"{len(problems)} attribution mismatches:\n"
                          + "\n".join(problems[:12]))


def _gen_compound_values(rng: random.Random) -> list:
    """Objects/arrays exercising the value-reading object keywords, tuple
    items, and structural const/enum: special keys, null values (absent
    vs JSON-null), nesting, heterogeneous arrays."""
    scalars = [0, 1, -1, Decimal("0.5"), "a", "Zz", "", True, False, None]
    vals = [
        [Decimal("1E-30")], [10**20, 2**53 + 1],
        {"x": Decimal("99999999999999999999.99999999999999999")},
        {"x": Decimal("1E-30")}, [Decimal("99999999999999999999.99999999999999999")],
        {}, [], [[]], {"a": 1}, {"a": None}, {"A": 1}, {"ab": "x"},
        {"a": 1, "b": 2, "c": 3}, {"a b": 1}, {"x.y": 2}, {"café": 3},
        {"foo": {"bar": [1, None]}}, {"1": "one", "12": "two"},
        [1, "two", True, None], [1, 1], [1, Decimal("1.0")], [1, True],
        [{"a": 1}, {"a": 1}], ["x", ["y", ["z"]]],
        {"foot": 1, "foo": "s"}, {"alpha": "x", "beta": 2},
    ]
    for _ in range(12):
        n = rng.randint(0, 4)
        vals.append([rng.choice(scalars) for _ in range(n)])
        vals.append({rng.choice("abcdef" + "AB_ -."): rng.choice(scalars)
                     for _ in range(n)})
    return vals


def _gen_compound_specs(rng: random.Random) -> list[dict]:
    subs = [{"type": "integer"}, {"type": "string"}, {"minimum": 1},
            {"maxLength": 1}, True, False, {"type": "null"},
            {"enum": [1, "a"]}]
    specs = [
        {"patternProperties": {"^a": {"type": "integer"}}},
        {"patternProperties": {"f.o": {"type": "integer"},
                               "o$": {"type": "string"}}},
        {"patternProperties": {"\\d+": {"type": "string"}}},
        {"properties": {"a": {"type": "integer"}},
         "patternProperties": {"^[ab]$": {"minimum": 0}},
         "additionalProperties": False},
        {"properties": {"a": True}, "additionalProperties": {"type": "integer"}},
        {"additionalProperties": {"type": "string"}},
        {"additionalProperties": False},
        {"propertyNames": {"pattern": "^[a-z]+$"}},
        {"propertyNames": {"maxLength": 2}},
        {"required": ["a b"], "properties": {"a b": {"type": "integer"}}},
        {"properties": {"x.y": {"minimum": 3}}},
        {"dependencies": {"a": "b"}},  # draft-4 single-string form
        {"dependencies": {"a": ["b", "c"]}},
        {"dependencies": {"a": {"required": ["b"]}}},
        {"items": [{"type": "integer"}, {"type": "string"}]},
        {"items": [{"type": "integer"}], "additionalItems": False},
        {"items": [{"type": "integer"}], "additionalItems": {"type": "string"}},
        {"items": [True, False]},
        {"const": [1, "two", None]}, {"const": {"a": 1, "b": [True]}},
        {"const": {}}, {"const": []}, {"const": [1, Decimal("0.5")]},
        # hostile numerics inside structural literals (fuzz-found r3:
        # scale-30 const was unequal to its own exactly-stored value)
        {"const": [Decimal("1E-30")]},
        {"const": {"x": Decimal("99999999999999999999.99999999999999999")}},
        {"const": [10**20, 2**53 + 1]},
        {"enum": [[Decimal("99999999999999999999.99999999999999999")],
                  {"x": Decimal("1E-30")}, [10**20]]},
        {"items": [{"maximum":
                    Decimal("99999999999999999999.99999999999999999")}]},
        {"patternProperties": {"^x$": {"multipleOf": 3}}},
        {"enum": [[1, 2], {"a": 1}, "x"]},
        {"enum": [{"a": None}, {}]},
        {"uniqueItems": True},
        {"contains": {"type": "string"}},
        {"not": {"patternProperties": {"^a": False}}},
        {"anyOf": [{"items": [{"const": 1}]},
                   {"additionalProperties": {"type": "integer"}}]},
    ]
    for _ in range(10):
        specs.append({"patternProperties":
                      {rng.choice(["^a", "b$", "[0-9]", "c.d", "^$"]):
                       rng.choice(subs)}})
        specs.append({"items": rng.sample(subs, rng.randint(1, 3)),
                      "additionalItems": rng.choice(subs)})
    return specs


def test_compound_differential_fuzz(spark):
    """Kernel vs VARIANT on object/array values — the value-reading object
    keywords, tuple items, and structural const/enum went Catalyst-native
    in r3; every verdict must match the interpreter's."""
    rng = random.Random(SEED + 1)
    values = _gen_compound_values(rng)
    specs = _gen_compound_specs(rng)
    kernel = Validator()

    # manual dump: Decimal inside compound values must render as a plain
    # number (json.dumps(default=str) would quote it)
    def dump(v):
        if isinstance(v, Decimal):
            return format(v, "f")
        if isinstance(v, dict):
            return "{" + ", ".join(
                f"{json.dumps(k, ensure_ascii=False)}: {dump(x)}"
                for k, x in v.items()) + "}"
        if isinstance(v, list):
            return "[" + ", ".join(dump(x) for x in v) + "]"
        return json.dumps(v, ensure_ascii=False)
    rows = [(i, dump(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, js string")

    from sparkschema.compiler.variantcol import (VariantUnsupported,
                                                 variant_valid_column)
    vcols, vspecs = [], []
    for j, spec in enumerate(specs):
        try:
            vcols.append(variant_valid_column("js", spec).alias(f"v{j}"))
            vspecs.append(j)
        except VariantUnsupported:
            pass
    assert len(vspecs) == len(specs), "compound specs must all compile now"
    got = {r.i: r for r in df.select("i", *vcols).collect()}

    problems = []
    for j in vspecs:
        spec = specs[j]
        for i, v in enumerate(values):
            expected = not kernel.validate(spec, v)
            gv = got[i][f"v{j}"]
            if bool(gv) != expected:
                problems.append(f"VARIANT spec={spec} v={v!r}: "
                                f"got={gv} kernel={expected}")
    assert not problems, (f"{len(problems)} divergences, first 10:\n"
                          + "\n".join(problems[:10]))
