"""Dynamic-JSON validation compiled to Spark 4 VARIANT expressions.

The second dynamic-JSON path, fully Catalyst-native: ``try_parse_json`` →
``try_variant_get`` / ``schema_of_variant`` / ``is_variant_null`` predicate
trees. No Python executes per row — this beats the Arrow/pandas kernel
(:mod:`sparkschema.compiler.jsoncol`) wherever the spec is bounded.

Notable: VARIANT distinguishes **absent** (SQL NULL from ``variant_get``)
from **JSON null** (``is_variant_null``) — the one semantic the typed-
column mapping collapses (SURVEY.md §1.4), preserved natively here exactly
like the reference's ``JsUndefined`` vs ``JsNull``.

Coverage: all scalar keywords, enum/const (incl. structural array/object
literals), nested ``properties`` / ``required``, ``items`` (single-schema
AND positional tuple + ``additionalItems``) + size bounds +
``uniqueItems`` + ``contains``, all combinators, boolean schemas, the
key-only object keywords (``propertyNames`` / ``min``/``maxProperties`` /
``additionalProperties: false`` / ``dependencies``) via
``json_object_keys(to_json(v))``, and the value-reading object keywords
(``patternProperties`` / schema-form ``additionalProperties``) via the
``map<string,variant>`` view (``try_cast`` preserves absent-vs-JSON-null
exactly like ``try_variant_get`` — probed on Spark 4.1). Unsupported
constructs ($ref, pathological multipleOf) raise
:class:`VariantUnsupported`; callers fall back to the Arrow kernel —
``json_valid_auto`` does exactly that.
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparkschema.compiler.formats_sql import format_predicate
from sparkschema.spec.jsonvalue import is_number

_DEC = "decimal(38,18)"
_SIMPLE_KEY = re.compile(r"^[A-Za-z0-9_\-]+$")

_UNSUPPORTED = ("$ref",)


class VariantUnsupported(Exception):
    """Spec construct with no VARIANT compilation — use the Arrow kernel."""


def _get(v: Column, key: str) -> Column:
    if _SIMPLE_KEY.match(key):
        return F.try_variant_get(v, f"$.{key}", "variant")
    # non-simple property name: no safe $-path quoting exists, so go
    # through the map view — try_cast preserves absent (SQL NULL) vs JSON
    # null (variant null) exactly like try_variant_get (probed, Spark 4.1)
    return F.try_element_at(v.try_cast("map<string,variant>"), F.lit(key))


def _entries(v: Column) -> Column:
    """Object entries as ``array<struct<key,value:variant>>`` (NULL for
    non-objects) — unlocks the value-reading object keywords
    (patternProperties / schema-form additionalProperties)."""
    return F.map_entries(v.try_cast("map<string,variant>"))


def _vtype(v: Column) -> Column:
    return F.schema_of_variant(v)


def _is_string(v: Column) -> Column:
    return _vtype(v) == "STRING"


def _is_bool(v: Column) -> Column:
    return _vtype(v) == "BOOLEAN"


def _is_numberv(v: Column) -> Column:
    t = _vtype(v)
    return t.isin("BIGINT", "DOUBLE", "FLOAT") | t.startswith("DECIMAL")


def _is_array(v: Column) -> Column:
    return _vtype(v).startswith("ARRAY")


def _is_object(v: Column) -> Column:
    return _vtype(v).startswith("OBJECT") | _vtype(v).startswith("STRUCT")


def _num(v: Column) -> Column:
    return F.try_variant_get(v, "$", _DEC)


def _str(v: Column) -> Column:
    return F.try_variant_get(v, "$", "string")


def _arr(v: Column) -> Column:
    return F.try_variant_get(v, "$", "array<variant>")


def _canon_num_text(t: Column) -> Column:
    """Normalize a PLAIN decimal rendering for equality: strip a trailing
    fractional-zero run and a bare trailing point (``1.500``→``1.5``,
    ``1.0``→``1``), fold ``-0``→``0``."""
    stripped = F.when(
        t.contains("."),
        F.regexp_replace(F.regexp_replace(t, r"(\.\d*?)0+$", "$1"),
                         r"\.$", "")).otherwise(t)
    return F.when(stripped.isin("-0", "-0.0"), F.lit("0")).otherwise(stripped)


def _canon_elem(e: Column) -> Column:
    """Canonical string of an array element implementing JSON equality:
    numbers normalize to one canonical text (1.0 ≡ 1 ≡ 1.00), other types
    keep their distinct JSON rendering. The numeric branch must be gated
    on the variant's actual type — casting BOOLEAN to decimal coerces
    true→1 and would merge ``[1, true]`` (draft4/uniqueItems.json golden
    case).

    Tiering (review find r4: the old single decimal(38,18) canon went
    NULL outside its window, collapsing DISTINCT extremes like
    [1e300, 2e300], and rounded scale>18 values together):

    - exact-stored (BIGINT/DECIMAL): the variant's string rendering is
      always plain decimal text — normalized, it is an exact canon for
      ANY magnitude/scale;
    - DOUBLE whose decimal(38,18) view round-trips: that view's text,
      normalized — equal in-window doubles and exacts share one canon;
    - other DOUBLEs: the double's own rendering under a ``dbl:`` tag —
      exact among doubles; the one residual is a double equal in value
      to an out-of-window exact decimal in the SAME array (kernel says
      duplicate, this canon keeps them distinct — documented tail)."""
    t = _vtype(e)
    exact_t = (t == "BIGINT") | t.startswith("DECIMAL")
    dbl = F.try_variant_get(e, "$", "double")
    d18 = _num(e)
    roundtrips = d18.isNotNull() & (d18.cast("double") == dbl)
    num_canon = F.when(exact_t, _canon_num_text(_str(e))) \
                 .when(roundtrips, _canon_num_text(d18.cast("string"))) \
                 .otherwise(F.concat(F.lit("dbl:"), dbl.cast("string")))
    return F.when(_is_numberv(e), F.concat(F.lit("n:"), num_canon)) \
            .otherwise(F.coalesce(F.to_json(e), F.lit("null")))


def _dec_text_cmp(v: Column, d: Decimal, op: str) -> Column:
    """Exact comparison of an exact-stored variant number against a bound,
    through the variant's STRING rendering (always plain decimal text —
    probed on Spark 4.1). Decision key: ``lpad(int_part) || rpad(frac)``
    compares lexicographically exactly like the number for same-signed
    values; signs handled explicitly. Covers the scale-19..38 window where
    every decimal extraction would round (review find r3b: DECIMAL(20,20)
    0.99999999999999999999 fell to the double view and passed minimum 1).
    NULL string (shouldn't happen for exact types) → NULL, caller
    coalesces."""
    s = F.try_variant_get(v, "$", "string")
    neg = s.startswith("-")
    mag = F.regexp_replace(s, "^-", "")
    int_part = F.substring_index(mag, ".", 1)
    frac = F.when(mag.contains("."), F.substring_index(mag, ".", -1)) \
            .otherwise(F.lit(""))
    key = F.concat(F.lpad(int_part, 39, "0"), F.rpad(frac, 38, "0"))

    dt = d.as_tuple()
    neg_d = dt.sign == 1
    mag_d = format(abs(d), "f")
    ip_d, _, fr_d = mag_d.partition(".")
    if len(ip_d) > 39:
        # |d| exceeds every storable value (38 digits max): constant
        lt_const = not neg_d
        if op in ("lt", "le"):
            return F.lit(lt_const)
        return F.lit(not lt_const)
    # a bound finer than 38 fractional digits can never equal a stored
    # value; truncating its key makes "equal keys" mean |v| < |d|
    d_finer = len(fr_d) > 38
    key_d = F.lit(ip_d.zfill(39) + fr_d[:38].ljust(38, "0"))

    if neg_d:
        # equal truncated keys ⟹ |v| < |d| ⟹ v > d for negatives: the
        # strict > is correct in BOTH modes
        lt = neg & (key > key_d)
        eq = F.lit(False) if d_finer else (neg & (key == key_d))
    else:
        lt = neg | ((key < key_d) if not d_finer else (key <= key_d))
        eq = F.lit(False) if d_finer else (~neg & (key == key_d))
    if op == "lt":
        return lt
    if op == "le":
        return lt | eq
    if op == "gt":
        return ~(lt | eq)
    return ~lt  # ge


def _stored_scale(t: Column) -> Column:
    """The value's STORED decimal scale parsed from ``schema_of_variant``
    (0 for BIGINT/others). Trailing zeros strip at parse, so this is the
    TRUE scale; extractions at a coarser scale ROUND, so every
    decimal-window read guards on it.

    Parsed with substring_index instead of a regex (this runs per
    keyword per row in interpreted trees): for a root DECIMAL type the
    scale is the digits between the last ',' and ')'. Every use site is
    gated on ``t == BIGINT | startswith DECIMAL``, so the value for
    nested types (where the old regex could match an EMBEDDED
    "DECIMAL(p,s)" inside e.g. ARRAY<...>) is never read."""
    return F.coalesce(
        F.when(t.startswith("DECIMAL("),
               F.substring_index(F.substring_index(t, ",", -1), ")", 1)
                .try_cast("int")),
        F.lit(0))


def _multiple_of_fail_variant(v: Column, mo: Any, t: Column,
                              n18: Column | None = None,
                              nd: Column | None = None) -> Column:
    """Decimal-exact ``multipleOf`` with the columnar path's overflow tiers
    (reference semantics NumberValidators.scala:89-109).

    The old ``(n % mo_dec) == 0`` on the decimal(38,12) extraction silently
    NULLed every value outside that window (|v| ≥ 1e26 or >12 fractional
    digits) and callers coalesced the NULL to "invalid" — e.g. a JSON 1e26
    with multipleOf 0.25 was flagged here, passed by the kernel.

    Dispatch on the variant's STORED type (VARIANT keeps JSON integer and
    plain-decimal literals exactly as BIGINT/DECIMAL; e-notation parses as
    DOUBLE — probed on Spark 4.1):

    - exact (BIGINT / DECIMAL) value fitting decimal(38,18): exact decimal
      remainder — this covers 2⁵³+1-style integers bit-for-bit;
    - exact scale-0 DECIMAL wider than 20 integer digits (e.g. a 27-digit
      literal): decimal(38,0) remainder, still exact;
    - DOUBLE/FLOAT (and the residual exact-but-unrepresentable tail):
      :meth:`ColumnCompiler._multiple_of_fail` on the double view, whose
      tiers match the kernel's as_decimal semantics (shortest repr < 2⁵³,
      exact binary integer ≥ 2⁵³).

    Known parse-level divergences (parse SUCCEEDS with an altered value,
    so no per-row fallback can catch them — probed on Spark 4.1,
    documented): JSON e-notation like ``1e26`` is a DOUBLE in VARIANT but
    an exact Decimal in the kernel's ``parse_json`` (residues mod an mo
    that distinguishes 10²⁶ from double(1e26) can differ); integers wider
    than 38 digits and exponents past double range (``1e999``) collapse to
    DOUBLE/Infinity where the kernel stays exact; a LONE surrogate escape
    in a string becomes ``?`` where Python keeps the surrogate
    (length/pattern checks on such strings can differ). Duplicate-key
    objects — which Spark REJECTS at parse — are handled: json_valid_auto
    re-routes those rows to the kernel.
    """
    from pyspark.sql import types as T

    from sparkschema.compiler.columns import ColumnCompiler
    from sparkschema.spec.jsonvalue import as_decimal, normalize_exact

    # pathological mo (≥16 significant digits or scale >18): the exact
    # double tier is an Arrow UDF in columns._multiple_of_fail, and Spark
    # cannot evaluate Python UDFs inside the HOF binding lambda this tree
    # lives in — hand the whole spec to the Arrow kernel instead
    import decimal as _dec

    mo_dec_ = normalize_exact(as_decimal(mo))
    s_ = max(-mo_dec_.as_tuple().exponent, 0)
    try:
        binary_mo_ = Decimal(float(mo_dec_)) == mo_dec_
    except (OverflowError, ValueError):
        binary_mo_ = False
    M_ = int(mo_dec_.scaleb(s_, _dec.Context(prec=60)))
    # s_ > 18 is pathological EVEN for binary-representable mo (e.g.
    # 2^-20, scale 20): the vscale>18 tier below assumes "value finer
    # than any multiple of mo" which only holds when scale(mo) <= 18 —
    # a stored DECIMAL(20,20) that IS 3*2^-20 was flagged (ADVICE r3)
    if s_ > 18 or not (binary_mo_ or 1 <= M_ <= 2 ** 53):
        raise VariantUnsupported("pathological multipleOf (kernel fallback)")

    exact = (t == "BIGINT") | t.startswith("DECIMAL")
    # callers inside a node binding pass the ALREADY-BOUND decimal(38,18)
    # and double views (b["n"] / b["nd"]) so the hot tiers read struct
    # fields instead of re-running two variant extractions per row
    # (interpreted trees get no CSE; guide §1.2) — values identical
    nd18 = n18 if n18 is not None \
        else F.try_variant_get(v, "$", "decimal(38,18)")
    d6 = F.try_variant_get(v, "$", "decimal(38,6)")
    d0 = F.try_variant_get(v, "$", "decimal(38,0)")
    dbl = nd if nd is not None else F.try_variant_get(v, "$", "double")
    # stored scale: extraction at a coarser scale ROUNDS, so each decimal
    # tier requires stored_scale <= extraction scale (fuzz-found r3: a
    # DECIMAL(22,1) with a .5 fraction slipped to the exact-binary double
    # path and "became" a multiple of 2)
    vscale = _stored_scale(t)
    fail18 = ColumnCompiler._multiple_of_fail(nd18, T.DecimalType(38, 18), mo)
    fail6 = ColumnCompiler._multiple_of_fail(d6, T.DecimalType(38, 6), mo)
    fail0 = ColumnCompiler._multiple_of_fail(d0, T.DecimalType(38, 0), mo)
    dbl_fail = F.coalesce(
        ColumnCompiler._multiple_of_fail(dbl, T.DoubleType(), mo), F.lit(True))
    # every decimal tier needs stored_scale <= extraction scale — the
    # extraction ROUNDS finer values (1E-30 came back 0E-18 from the nd18
    # tier and "was" a multiple of everything; fuzz-found r3). A stored
    # scale BEYOND 18 means a nonzero digit past 10^-18 (trailing zeros
    # strip at parse) while this mo has scale <= 18 (pathological raised
    # above): such a value can NEVER be a multiple — k*mo has scale <=
    # scale(mo) (review find r3b: DECIMAL(20,20) fell to the double view)
    return F.coalesce(
        F.when(exact & (vscale > 18), F.lit(True))
         .when(exact & (vscale <= 18) & nd18.isNotNull(), fail18)
         .when(exact & (vscale <= 6) & d6.isNotNull(), fail6)
         .when(exact & (vscale == 0) & d0.isNotNull(), fail0)
         .otherwise(dbl_fail),
        F.lit(True))


def _num_eq_variant(v: Column, c: Any, t: Column) -> Column:
    """JSON-equality of a variant number against a literal, tiered like
    ``columns._num_eq_lit``: the old ``_num(v) == F.lit(c).cast(decimal(38,
    12))`` CRASHED at plan time for literals outside that window (ANSI
    decimal overflow on constant folding) and NULLed out-of-range values.

    Exact-stored variants (BIGINT/DECIMAL) compare decimal-exactly when the
    literal fits decimal(38,18) (or scale-0 decimal(38,0) for wide whole
    literals); doubles compare through the kernel's shortest-repr
    representability view (< 2⁵³) / exact-binary identity (≥ 2⁵³)."""
    from sparkschema.compiler.columns import _dec_precision
    from sparkschema.spec.jsonvalue import as_decimal, normalize_exact

    d = normalize_exact(as_decimal(c))
    scale = max(-d.as_tuple().exponent, 0)
    int_digits = _dec_precision(d) - scale

    exact = (t == "BIGINT") | t.startswith("DECIMAL")
    nd18 = F.try_variant_get(v, "$", "decimal(38,18)")
    d0 = F.try_variant_get(v, "$", "decimal(38,0)")
    dbl = F.try_variant_get(v, "$", "double")
    # the value's STORED scale, parsed from schema_of_variant — extraction
    # at a smaller scale ROUNDS (try_variant_get, HALF_UP), so every
    # decimal-equality tier must require stored_scale ≤ extraction scale
    # or a rounded near-miss would compare equal (0.54 == 0.5 at scale 1)
    vscale = _stored_scale(t)  # BIGINT stores scale 0

    if scale <= 18 and int_digits <= 20:
        exact_eq = F.coalesce((vscale <= 18) & (nd18 == F.lit(d)), F.lit(False))
    elif scale == 0 and _dec_precision(d) <= 38:
        exact_eq = F.coalesce((vscale == 0) & (d0 == F.lit(d)), F.lit(False))
    elif scale <= 38 and _dec_precision(d) <= 38:
        # wide (21-38 integer digits) or fine (scale 19-38) literals:
        # VARIANT stores up to 38 digits exactly — extract at the
        # literal's own scale; exact when the stored scale is no finer
        # (a scale-30 const was declared unequal to its own exactly-stored
        # value; fuzz-found r3)
        ds = F.try_variant_get(v, "$", f"decimal(38,{scale})")
        exact_eq = F.coalesce((vscale <= scale) & (ds == F.lit(d)),
                              F.lit(False))
    else:
        # >38-digit literal: no exactly-stored JSON number can equal it
        exact_eq = F.lit(False)

    try:
        representable = as_decimal(float(d)) == d
    except (OverflowError, ValueError):
        representable = False
    dbl_eq = F.coalesce(dbl == F.lit(float(d)), F.lit(False)) \
        if representable else F.lit(False)
    return F.coalesce(F.when(exact, exact_eq).otherwise(dbl_eq), F.lit(False))


def _json_eq_deep(v: Column, c: Any, depth: int = 0) -> Column:
    """Structural JSON equality of a variant against a LITERAL value,
    matching the kernel's deep equality (1.0 ≡ 1 numerically, 1 ≢ true,
    object key SETS equal, array order significant — jsonvalue.json_equal).
    Compile-time recursion over the literal bounds the predicate size;
    absent map keys / out-of-range indexes surface as SQL NULL and the
    coalesce makes them unequal. Never NULL (callers AND it directly)."""
    if depth > 32:
        raise VariantUnsupported("const/enum literal nesting too deep")
    t = _vtype(v)
    if c is None:
        return F.coalesce(F.is_variant_null(v), F.lit(False))
    if isinstance(c, bool):
        return F.coalesce(
            (t == "BOOLEAN") & (F.try_variant_get(v, "$", "boolean") == c),
            F.lit(False))
    if is_number(c):
        is_num = t.isin("BIGINT", "DOUBLE", "FLOAT") | t.startswith("DECIMAL")
        return F.coalesce(is_num & _num_eq_variant(v, c, t), F.lit(False))
    if isinstance(c, str):
        return F.coalesce(
            (t == "STRING") & (F.try_variant_get(v, "$", "string") == c),
            F.lit(False))
    if isinstance(c, list):
        arr = F.try_variant_get(v, "$", "array<variant>")
        cond = t.startswith("ARRAY") & (F.size(arr) == len(c))
        for i, ci in enumerate(c):
            cond = cond & _json_eq_deep(F.get(arr, i), ci, depth + 1)
        return F.coalesce(cond, F.lit(False))
    if isinstance(c, dict):
        m = v.try_cast("map<string,variant>")
        cond = (t.startswith("OBJECT") | t.startswith("STRUCT")) \
            & (F.size(m) == len(c))
        for k, cv in c.items():
            cond = cond & _json_eq_deep(F.try_element_at(m, F.lit(k)), cv,
                                        depth + 1)
        return F.coalesce(cond, F.lit(False))
    raise VariantUnsupported(f"const/enum literal {type(c).__name__}")


def _object_keys(v: Column) -> Column:
    """Keys of a variant object as ``array<string>`` (NULL for non-objects)
    — ``json_object_keys`` over the variant's JSON text. Stays Catalyst-
    native (one serialization, zero Python); unlocks the key-only object
    keywords that previously fell back to the Arrow kernel (VERDICT r2 #8)."""
    return F.json_object_keys(F.to_json(v))


def _propname_ok(k: Column, schema: Any) -> Column:
    """Validity of one property NAME (a string instance) against the
    ``propertyNames`` schema — string keywords only (ObjectValidators
    .scala:16-35 validates each key as a JsString)."""
    if schema is True:
        return F.lit(True)
    if schema is False:
        return F.lit(False)
    if not isinstance(schema, dict):
        return F.lit(True)
    supported = {"type", "minLength", "maxLength", "pattern", "enum",
                 "const", "format"}
    unknown = set(schema) - supported
    if unknown:
        raise VariantUnsupported(f"propertyNames keywords {sorted(unknown)}")
    from sparkschema.compiler.columns import grapheme_length_col

    ok = F.lit(True)
    t = schema.get("type")
    if t is not None:
        names = t if isinstance(t, list) else [t]
        ok = ok & F.lit("string" in names)
    mn = schema.get("minLength")
    if isinstance(mn, int) and not isinstance(mn, bool):
        ok = ok & (grapheme_length_col(k) >= mn)
    mx = schema.get("maxLength")
    if isinstance(mx, int) and not isinstance(mx, bool):
        ok = ok & (grapheme_length_col(k) <= mx)
    pat = schema.get("pattern")
    if isinstance(pat, str):
        jp = _pattern_or_invalid(pat)
        # invalid pattern: every property NAME fails (kernel
        # str.invalid.pattern); no runtime rlike crash (review find r4)
        ok = ok & (F.lit(False) if jp is None else k.rlike(jp))
    if "enum" in schema:
        lits = [e for e in schema["enum"] if isinstance(e, str)]
        ok = ok & (k.isin(lits) if lits else F.lit(False))
    if "const" in schema:
        c = schema["const"]
        ok = ok & ((k == F.lit(c)) if isinstance(c, str) else F.lit(False))
    fmt = schema.get("format")
    if isinstance(fmt, str) and fmt not in ("int32", "int64"):
        # int32/int64 are NUMBER formats — vacuous on string property
        # names (the kernel's checkers gate on isinstance(int)); the SQL
        # predicate computed `name % 1` and threw CAST_INVALID_INPUT
        # under ANSI for non-numeric keys (review find r4)
        ok = ok & format_predicate(fmt, k)
    return ok


def _pattern_or_invalid(pat: str) -> str | None:
    """Java regex for the ``pattern`` KEYWORD: ``None`` when the kernel
    emits str.invalid.pattern (pattern compiles in neither form — every
    string value fails, interpreter.py:356-359); VariantUnsupported when
    only the translated form is uncompilable (kernel semantics would come
    from the raw pattern — fall back)."""
    from sparkschema.spec.ecma_pattern import translate_ecma_checked

    tp = translate_ecma_checked(pat, "python")
    try:
        re.compile(tp)
    except re.error:
        try:
            re.compile(pat)
        except re.error:
            return None
        raise VariantUnsupported(f"pattern {pat!r} untranslatable")
    return _checked_java_form(pat)


def _checked_java_form(pat: str) -> str:
    """Translate ``pat`` to the Java dialect AND prove the translation
    compiles on the live JVM. The Python-form gate alone is not enough:
    a pattern whose Python rewrite compiles while the Java form is
    invalid (e.g. a non-ASCII named group ``(?<nmü>x)``, accepted by
    Python, rejected by Java) previously reached ``rlike`` unverified and
    crashed the whole job at evaluation time — the exact failure this
    gate exists to prevent (ADVICE r4). Java-compile failure ⇒
    :class:`VariantUnsupported` (kernel fallback). With no active JVM
    (pure-driver unit tests) the check is skipped; any such pattern is
    then only ever evaluated by the kernel anyway."""
    from sparkschema.spec.ecma_pattern import translate_ecma_checked

    jp = translate_ecma_checked(pat, "java")
    try:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        jvm = spark._jvm if spark is not None else None
    except Exception:
        jvm = None
    if jvm is not None:
        try:
            jvm.java.util.regex.Pattern.compile(jp)
        except Exception:
            raise VariantUnsupported(
                f"pattern {pat!r}: Java form does not compile") from None
    return jp


def _java_pattern(pat: str) -> str | None:
    """Java regex for an ECMA patternProperties pattern, mirroring the
    kernel's skip rule (interpreter._compile_pattern): ``None`` when the
    kernel would skip the pattern entirely (nothing compiles);
    :class:`VariantUnsupported` when the kernel's semantics would come
    from the RAW pattern (translated form uncompilable) — fall back to
    the kernel rather than diverge on that edge."""
    from sparkschema.spec.ecma_pattern import translate_ecma_checked

    tp = translate_ecma_checked(pat, "python")
    try:
        re.compile(tp)
    except re.error:
        try:
            re.compile(pat)
        except re.error:
            return None  # the kernel skips this pattern too
        raise VariantUnsupported(f"pattern {pat!r} untranslatable")
    return _checked_java_form(pat)


def _compiled_patprops(schema: dict) -> list[tuple[str, Any]]:
    """``(java_pattern, subschema)`` pairs for ``patternProperties``,
    skipping exactly the patterns the kernel skips."""
    out: list[tuple[str, Any]] = []
    pp = schema.get("patternProperties")
    if isinstance(pp, dict):
        for pat, sub in pp.items():
            jp = _java_pattern(pat)
            if jp is not None:
                out.append((jp, sub))
    return out


def _needs(schema: dict) -> dict:
    """Which bound slots this node's own keywords read (driver-side scan;
    same-``v`` recursion rebinds, so only THIS node's keywords count)."""
    from sparkschema.spec.jsonvalue import is_number as _isn

    consts = list(schema.get("enum") or [])
    if "const" in schema:
        consts.append(schema["const"])
    tnames = schema.get("type")
    tnames = (tnames if isinstance(tnames, list) else [tnames]) if tnames else []
    fmt = schema.get("format")
    return {
        "n": (any(_isn(schema.get(k)) for k in
                  ("minimum", "maximum", "exclusiveMinimum",
                   "exclusiveMaximum", "multipleOf"))
              or "integer" in tnames
              or fmt in ("int32", "int64")
              or any(_isn(c) for c in consts)),
        "s": (any(isinstance(schema.get(k), int)
                  and not isinstance(schema.get(k), bool)
                  for k in ("minLength", "maxLength"))
              or isinstance(schema.get("pattern"), str)
              or (isinstance(fmt, str) and fmt not in ("int32", "int64"))
              or any(isinstance(c, str) for c in consts)),
        "a": any(k in schema for k in
                 ("minItems", "maxItems", "uniqueItems", "items", "contains")),
        "k": (any(k in schema for k in
                  ("propertyNames", "minProperties", "maxProperties",
                   "dependencies"))
              or schema.get("additionalProperties") is False),
        "m": (isinstance(schema.get("patternProperties"), dict)
              or isinstance(schema.get("additionalProperties"), dict)),
    }


def variant_valid(v: Column, schema: Any, depth: int = 0) -> Column:
    """True iff the variant value at ``v`` satisfies ``schema``.
    SQL-NULL ``v`` (absent property) passes vacuously — ``required`` is the
    parent's business, exactly like the kernel.

    The node's shared sub-expressions — ``schema_of_variant``, the numeric
    / string / array extractions, ``json_object_keys(to_json(v))`` — are
    BOUND through a 1-element-array HOF lambda so each evaluates once per
    row instead of once per keyword reference (interpreted expressions get
    no CSE; the same lambda-binding trick as dedup.char_shingles). Only
    the slots this node's keywords actually read are materialized."""
    if depth > 32:
        raise VariantUnsupported("spec nesting too deep")
    if schema is True:
        return F.lit(True)
    if schema is False:
        return v.isNull()  # only absence "passes" a false schema vacuously
    if not isinstance(schema, dict):
        return F.lit(True)
    for kw in _UNSUPPORTED:
        if kw in schema:
            raise VariantUnsupported(kw)

    needs = _needs(schema)
    fields = [_vtype(v).alias("t")]
    if needs["n"]:
        fields.append(_num(v).alias("n"))
        fields.append(F.try_variant_get(v, "$", "double").alias("nd"))
    if needs["s"]:
        fields.append(_str(v).alias("s"))
    if needs["a"]:
        fields.append(_arr(v).alias("a"))
    if needs["k"]:
        fields.append(_object_keys(v).alias("k"))
    if needs["m"]:
        fields.append(_entries(v).alias("m"))
    return F.get(F.transform(
        F.array(F.struct(*fields)),
        lambda b: _node_valid(v, b, schema, depth)), 0)


def variant_valid_many(v: Column, schemas: list, depth: int = 0) -> Column:
    """One ``struct<q0: boolean, …>`` column with the verdict of EVERY
    schema in ``schemas`` against the same variant ``v``, all evaluated
    inside a single HOF binding of the UNION of the schemas' root slots.

    ``variant_valid`` binds per tree, so N arms over one document each
    re-evaluate the shared root work — ``schema_of_variant`` (renders a
    type string proportional to the document), ``json_object_keys(
    to_json(v))``, the ``map<string,variant>`` entries cast — N times per
    row (interpreted VARIANT expressions get no CSE; VERDICT r4 next #3).
    Here those slots materialize once and every arm reads the same bound
    struct.

    The result must be consumed as ONE expression (or materialized behind
    an exchange/persist barrier) before its fields are referenced
    individually — a projection alias read k times is inlined k times,
    re-running every arm."""
    if not schemas:
        return F.struct(F.lit(True).alias("q0"))
    dict_schemas = [s for s in schemas if isinstance(s, dict)]
    for s in dict_schemas:  # eager VariantUnsupported, like variant_valid
        for kw in _UNSUPPORTED:
            if kw in s:
                raise VariantUnsupported(kw)
    union: dict[str, bool] = {k: False for k in "nsakm"}
    for s in dict_schemas:
        for k, flag in _needs(s).items():
            union[k] = union[k] or flag
    fields = [_vtype(v).alias("t")]
    if union["n"]:
        fields.append(_num(v).alias("n"))
        fields.append(F.try_variant_get(v, "$", "double").alias("nd"))
    if union["s"]:
        fields.append(_str(v).alias("s"))
    if union["a"]:
        fields.append(_arr(v).alias("a"))
    if union["k"]:
        fields.append(_object_keys(v).alias("k"))
    if union["m"]:
        fields.append(_entries(v).alias("m"))

    def _one(b: Column, s: Any) -> Column:
        if s is True:
            return F.lit(True)
        if s is False:
            return v.isNull()
        if not isinstance(s, dict):
            return F.lit(True)
        return _node_valid(v, b, s, depth)

    return F.get(F.transform(
        F.array(F.struct(*fields)),
        lambda b: F.struct(*[_one(b, s).alias(f"q{i}")
                             for i, s in enumerate(schemas)])), 0)


def _node_valid(v: Column, b: Column, schema: dict, depth: int) -> Column:
    present = v.isNotNull()
    needs = _needs(schema)
    t = b["t"]
    is_num = t.isin("BIGINT", "DOUBLE", "FLOAT") | t.startswith("DECIMAL")
    # the value's STORED scale (trailing zeros strip at parse, so this is
    # the true scale); extractions at a coarser scale ROUND, so every
    # decimal-window read guards on it
    vscale = _stored_scale(t)
    ok = F.lit(True)

    def type_ok(name: str) -> Column:
        if name == "string":
            return t == "STRING"
        if name == "boolean":
            return t == "BOOLEAN"
        if name == "number":
            return is_num
        if name == "integer":
            nn, nd = b["n"], b["nd"]
            # decimal window -> exact floor compare; wide exact DECIMALs
            # check their string rendering for a nonzero fraction (the
            # ">= 2^53 is whole" shortcut only holds for DOUBLE-stored
            # values); DOUBLE >= 2^53 is always whole; else floor-compare
            # the double (branch-guarded: floor(double) -> long would
            # throw under ANSI past 2^53)
            exact_t = (t == "BIGINT") | t.startswith("DECIMAL")
            # the decimal-window tier is for EXACT-stored values only:
            # nn of a DOUBLE rounds (1e-19 -> 0 "is" an integer) — DOUBLE/
            # FLOAT must fall through to the double branches (ADVICE r3)
            return is_num & (
                F.when(exact_t & nn.isNotNull() & (vscale <= 18),
                       nn == F.floor(nn).cast(_DEC))
                 .when(exact_t,
                       ~F.try_variant_get(v, "$", "string")
                        .rlike(r"\.\d*[1-9]"))
                 .when(F.abs(nd) >= F.lit(float(2 ** 53)), F.lit(True))
                 .otherwise(nd == F.floor(nd).cast("double")))
        if name == "array":
            return t.startswith("ARRAY")
        if name == "object":
            return t.startswith("OBJECT") | t.startswith("STRUCT")
        if name == "null":
            return F.is_variant_null(v)
        raise VariantUnsupported(f"unknown type {name!r}")

    tn = schema.get("type")
    if tn is not None:
        names = tn if isinstance(tn, list) else [tn]
        cond = type_ok(names[0])
        for name in names[1:]:
            cond = cond | type_ok(name)
        ok = ok & ~(present & ~cond)

    def const_ok(c: Any) -> Column:
        if c is None:
            return F.is_variant_null(v)
        if isinstance(c, bool):
            return (t == "BOOLEAN") & (F.try_variant_get(v, "$", "boolean") == c)
        if is_number(c):
            return is_num & _num_eq_variant(v, c, t)
        if isinstance(c, str):
            return (t == "STRING") & (b["s"] == c)
        # structural array/object literals: compile-time recursion over
        # the literal builds a bounded deep-equality predicate
        return _json_eq_deep(v, c)

    if "enum" in schema:
        cond = F.lit(False)
        for e in schema["enum"]:
            cond = cond | const_ok(e)
        ok = ok & ~(present & ~cond)
    if "const" in schema:
        ok = ok & ~(present & ~const_ok(schema["const"]))

    # numeric keywords gate on the value being a number (vacuous otherwise)
    if needs["n"]:
        n, nd = b["n"], b["nd"]
        isnum = present & is_num

        def num_cmp(bound_val, op: str) -> Column:
            """Bound comparison that never NULL-poisons: decimal-exact in
            the decimal(38,18) window, double view outside it (values with
            >20 integer digits / bounds wider than the window compare in
            double — a documented 1-ulp tail past 1e20; the old
            decimal(38,12) cast NULLed there and coalesced to invalid)."""
            from sparkschema.compiler.columns import (_dec_precision,
                                                      _double_cmp)
            from sparkschema.spec.jsonvalue import as_decimal, normalize_exact

            d = normalize_exact(as_decimal(bound_val))
            s = max(-d.as_tuple().exponent, 0)
            fits = (_dec_precision(d) <= 38 and s <= 18
                    and _dec_precision(d) - s <= 20)

            def apply(c: Column, lit: Column) -> Column:
                return {"gt": c > lit, "ge": c >= lit,
                        "lt": c < lit, "le": c <= lit}[op]

            exact_t = (t == "BIGINT") | t.startswith("DECIMAL")
            vscale = _stored_scale(t)
            # double-typed variants go through the direction-aware
            # boundary double (kernel-exact even when the bound falls
            # between a double's decimal views — fuzz-found r3)
            dbl_cond = _double_cmp(nd, bound_val, op)
            if fits:
                # n is faithful only when the stored scale fits the
                # extraction scale (rounding could cross the bound); wide
                # exact values (21+ int digits) compare at the bound's own
                # scale, scale-19..38 values through the exact text
                # comparator, before falling to the double view
                ds = F.try_variant_get(v, "$", f"decimal(38,{s})")
                # every n/nn decimal tier is gated on exact_t: n of a
                # DOUBLE-stored value ROUNDS to scale 18 (shortest repr
                # of 9.999999999999998e-4 has 19 fractional digits), so
                # doubles must reach dbl_cond (ADVICE r3)
                return F.when(exact_t & n.isNotNull() & (vscale <= 18),
                              apply(n, F.lit(d))) \
                        .when(exact_t & (vscale > 18),
                              _dec_text_cmp(v, d, op)) \
                        .when(exact_t & (vscale <= s) & ds.isNotNull(),
                              apply(ds, F.lit(d))) \
                        .otherwise(dbl_cond)
            # bound outside the window: an in-window n (scale ≤ 18,
            # |n| < 10²⁰) still compares EXACTLY — constant when
            # |d| ≥ 10²⁰ (every window value is smaller in magnitude),
            # else against d floored/ceiled to scale 18 (n is a multiple
            # of 10⁻¹⁸, so the strict relation is preserved). The old
            # n.cast("double") middle tier collapsed B37 onto 1e20 and
            # declared it ≥ 10²⁰ (fuzz-found r3).
            import decimal as _dec
            if abs(d) >= Decimal(10) ** 20:
                n_cmp = F.lit(op in ("lt", "le") if d > 0
                              else op in ("gt", "ge"))
            else:
                q18 = Decimal(1).scaleb(-18)
                with _dec.localcontext() as ctx:
                    ctx.prec = 60
                    dlo = d.quantize(q18, rounding=_dec.ROUND_FLOOR)
                    dhi = d.quantize(q18, rounding=_dec.ROUND_CEILING)
                if dlo == d:
                    n_cmp = apply(n, F.lit(dlo))
                elif op in ("le", "lt"):
                    n_cmp = n <= F.lit(dlo)
                else:
                    n_cmp = n >= F.lit(dhi)
            # wide bound (21-38 integer digits): exactly-stored values
            # whose scale is no finer than the bound's compare exactly at
            # the bound's own scale (fuzz-found r3: a wide DECIMAL equal
            # to the bound diverged through the double view); the rest
            # fall to the double comparisons
            if s <= 18 and _dec_precision(d) <= 38:
                ds = F.try_variant_get(v, "$", f"decimal(38,{s})")
                return F.when(exact_t & (vscale <= s) & ds.isNotNull(),
                              apply(ds, F.lit(d))) \
                        .when(exact_t & (vscale > 18),
                              _dec_text_cmp(v, d, op)) \
                        .when(exact_t & n.isNotNull() & (vscale <= 18),
                              n_cmp) \
                        .otherwise(dbl_cond)
            return F.when(exact_t & (vscale > 18), _dec_text_cmp(v, d, op)) \
                    .when(exact_t & n.isNotNull() & (vscale <= 18), n_cmp) \
                    .otherwise(dbl_cond)

        for kw in ("minimum", "maximum"):
            bound = schema.get(kw)
            if is_number(bound):
                excl = schema.get("exclusiveMinimum" if kw == "minimum"
                                  else "exclusiveMaximum") is True
                if kw == "minimum":
                    cond = num_cmp(bound, "gt" if excl else "ge")
                else:
                    cond = num_cmp(bound, "lt" if excl else "le")
                ok = ok & ~(isnum & ~cond)
        emn = schema.get("exclusiveMinimum")
        if is_number(emn):
            ok = ok & ~(isnum & ~num_cmp(emn, "gt"))
        emx = schema.get("exclusiveMaximum")
        if is_number(emx):
            ok = ok & ~(isnum & ~num_cmp(emx, "lt"))
        mo = schema.get("multipleOf")
        if is_number(mo):
            ok = ok & ~(isnum & _multiple_of_fail_variant(v, mo, t,
                                                          n18=n, nd=nd))
        if schema.get("format") in ("int32", "int64"):
            from sparkschema.compiler.formats_sql import int_format_double
            fmtname = schema["format"]
            # DOUBLE-stored values need the exact-boundary double check
            # (nd18 of -9.223372036854776e18 reprs to ...776000, outside
            # int64 even though the double IS Long.MIN); decimal-window
            # reads guard on the stored scale (1E-30 rounded to 0 and
            # "was" an int32 — fuzz-found r3); exact values outside both
            # windows are wide (>20 int digits) or fine-scaled — never ints
            pred = F.when(t.isin("DOUBLE", "FLOAT"),
                          int_format_double(nd, fmtname)) \
                    .when(n.isNotNull() & (vscale <= 18),
                          format_predicate(fmtname, n)) \
                    .otherwise(F.lit(False))
            ok = ok & ~(isnum & ~F.coalesce(pred, F.lit(False)))

    if needs["s"]:
        s = b["s"]
        isstr = present & (t == "STRING")
        mn = schema.get("minLength")
        if isinstance(mn, int) and not isinstance(mn, bool):
            from sparkschema.compiler.columns import grapheme_length_col
            ok = ok & ~(isstr & (grapheme_length_col(s) < mn))
        mx = schema.get("maxLength")
        if isinstance(mx, int) and not isinstance(mx, bool):
            from sparkschema.compiler.columns import grapheme_length_col
            ok = ok & ~(isstr & (grapheme_length_col(s) > mx))
        pat = schema.get("pattern")
        if isinstance(pat, str):
            # compile-time validity check (the _java_pattern kernel-skip
            # shape): an uncompilable regex previously crashed the WHOLE
            # job at rlike evaluation, while the kernel emits
            # str.invalid.pattern — every string value fails (review r4)
            jp = _pattern_or_invalid(pat)
            if jp is None:
                ok = ok & ~isstr
            else:
                ok = ok & ~(isstr & ~s.rlike(jp))
        fmt = schema.get("format")
        if isinstance(fmt, str) and fmt not in ("int32", "int64"):
            ok = ok & ~(isstr & ~format_predicate(fmt, s))

    if needs["a"]:
        arr = b["a"]
        isarr = present & t.startswith("ARRAY")
        mn = schema.get("minItems")
        if isinstance(mn, int) and not isinstance(mn, bool):
            ok = ok & ~(isarr & (F.size(arr) < mn))
        mx = schema.get("maxItems")
        if isinstance(mx, int) and not isinstance(mx, bool):
            ok = ok & ~(isarr & (F.size(arr) > mx))
        if schema.get("uniqueItems") is True:
            canon = F.transform(arr, _canon_elem)
            ok = ok & ~(isarr & (F.size(F.array_distinct(canon)) != F.size(canon)))
        items = schema.get("items")
        if isinstance(items, (dict, bool)) and items is not True:
            elem_ok = F.forall(arr, lambda e: variant_valid(e, items, depth + 1))
            ok = ok & ~(isarr & ~elem_ok)
        elif isinstance(items, list):
            # positional tuple schemas + additionalItems
            # (TupleValidators.scala:44-108; interpreter.py:378-392)
            for i, sub in enumerate(items):
                el = F.get(arr, i)  # SQL NULL past the end -> vacuous pass
                el_ok = variant_valid(el, sub, depth + 1)
                ok = ok & ~(isarr & (F.size(arr) > i) & ~el_ok)
            add = schema.get("additionalItems")
            if add is False:
                ok = ok & ~(isarr & (F.size(arr) > len(items)))
            elif isinstance(add, (dict, bool)) and add is not True:
                tail = F.slice(arr, len(items) + 1,
                               2147483647 - len(items) - 1)
                tail_ok = F.forall(
                    tail, lambda e: variant_valid(e, add, depth + 1))
                ok = ok & ~(isarr & (F.size(arr) > len(items)) & ~tail_ok)
        if "contains" in schema:
            has = F.exists(arr, lambda e: variant_valid(e, schema["contains"],
                                                        depth + 1)
                           & e.isNotNull())
            ok = ok & ~(isarr & ~has)

    props = schema.get("properties")
    isobj = present & (t.startswith("OBJECT") | t.startswith("STRUCT"))
    if isinstance(props, dict):
        for k, sub in props.items():
            child_ok = variant_valid(_get(v, k), sub, depth + 1)
            ok = ok & ~(isobj & ~child_ok)
    req = schema.get("required")
    if isinstance(req, list):
        for k in req:
            ok = ok & ~(isobj & _get(v, k).isNull())

    # key-only object keywords over json_object_keys(to_json(v)) — all
    # Catalyst-native (ObjectValidators.scala:16-35,128-171,173-258)
    if needs["k"]:
        keys = b["k"]
        if "propertyNames" in schema:
            pn = schema["propertyNames"]
            ok = ok & ~(isobj & ~F.forall(keys, lambda k: _propname_ok(k, pn)))
        mnp = schema.get("minProperties")
        if isinstance(mnp, int) and not isinstance(mnp, bool):
            ok = ok & ~(isobj & (F.size(keys) < mnp))
        mxp = schema.get("maxProperties")
        if isinstance(mxp, int) and not isinstance(mxp, bool):
            ok = ok & ~(isobj & (F.size(keys) > mxp))
        if schema.get("additionalProperties") is False:
            # allowed keys: declared properties ∪ patternProperties matches
            # (unmatched.intersect(remaining), ObjectConstraints4.scala:53)
            declared = list((props or {}).keys())
            pats = [jp for jp, _ in _compiled_patprops(schema)]

            def allowed(k: Column) -> Column:
                c = k.isin(declared) if declared else F.lit(False)
                for jp in pats:
                    c = c | k.rlike(jp)
                return c

            ok = ok & ~(isobj & ~F.forall(keys, allowed))
        deps = schema.get("dependencies")
        if isinstance(deps, dict):
            for dk, dv in deps.items():
                has = F.coalesce(F.array_contains(keys, F.lit(dk)), F.lit(False))
                if isinstance(dv, list):
                    dep_ok = F.lit(True)
                    for r in dv:
                        dep_ok = dep_ok & F.array_contains(keys, F.lit(r))
                elif isinstance(dv, str):  # draft-4 single-string form
                    dep_ok = F.array_contains(keys, F.lit(dv))
                elif isinstance(dv, (dict, bool)):
                    dep_ok = variant_valid(v, dv, depth + 1)
                else:
                    raise VariantUnsupported("dependencies value form")
                ok = ok & ~(isobj & has & ~F.coalesce(dep_ok, F.lit(False)))

    # value-reading object keywords over the map<string,variant> entries
    # (ObjectValidators.scala:128-171; interpreter.py:448-475)
    if needs["m"]:
        entries = b["m"]
        pairs = _compiled_patprops(schema)
        for jp, sub in pairs:
            def _pat_ok(jp=jp, sub=sub):  # bind per-pattern, 1-arg lambdas
                return F.forall(
                    F.filter(entries, lambda e: e["key"].rlike(jp)),
                    lambda e: variant_valid(e["value"], sub, depth + 1))
            ok = ok & ~(isobj & ~_pat_ok())
        ap = schema.get("additionalProperties")
        if isinstance(ap, dict):
            declared = list((props or {}).keys())
            pats = [jp for jp, _ in pairs]

            def _extra(e: Column) -> Column:
                c = ~e["key"].isin(declared) if declared else F.lit(True)
                for jp in pats:
                    c = c & ~e["key"].rlike(jp)
                return c

            ap_ok = F.forall(
                F.filter(entries, _extra),
                lambda e: variant_valid(e["value"], ap, depth + 1))
            ok = ok & ~(isobj & ~ap_ok)

    for comb in ("allOf", "anyOf", "oneOf"):
        subs = schema.get(comb)
        if isinstance(subs, list) and subs:
            conds = [variant_valid(v, sub, depth + 1) for sub in subs]
            if comb == "allOf":
                agg = conds[0]
                for c in conds[1:]:
                    agg = agg & c
            elif comb == "anyOf":
                agg = conds[0]
                for c in conds[1:]:
                    agg = agg | c
            else:
                agg = conds[0].cast("int")
                for c in conds[1:]:
                    agg = agg + c.cast("int")
                agg = agg == 1
            ok = ok & ~(present & ~agg)
    if "not" in schema:
        ok = ok & ~(present & variant_valid(v, schema["not"], depth + 1))
    if "if" in schema:
        cond = variant_valid(v, schema["if"], depth + 1)
        then_ok = variant_valid(v, schema["then"], depth + 1) \
            if "then" in schema else F.lit(True)
        else_ok = variant_valid(v, schema["else"], depth + 1) \
            if "else" in schema else F.lit(True)
        ok = ok & ~(present & ~F.when(cond, then_ok).otherwise(else_ok))
    return ok


def variant_valid_column(json_col: Column | str, schema: Any) -> Column:
    """Boolean Column over a JSON-text column: NULL input → NULL; unparsable
    → False (err.parse.json); else the compiled VARIANT predicate.

    The parse is BOUND through a one-element-array HOF lambda so
    ``try_parse_json`` evaluates once per row: referencing ``v`` directly
    re-parsed the document at every keyword/property site (no CSE for
    interpreted variant expressions; review find r4 — binding measured
    3.8→2.0 s at 1 property and 20.2→14.0 s at 12 on 300 k rows; the
    remaining width-linearity is the per-keyword variant ops themselves).
    The compile itself must happen OUTSIDE the lambda so
    VariantUnsupported still raises eagerly for json_valid_auto."""
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    probe = variant_valid(F.try_parse_json(col), schema)  # noqa: F841
    del probe  # compile-check only (raises VariantUnsupported eagerly)

    def body(v: Column) -> Column:
        return F.when(v.isNull(), F.lit(False)) \
                .otherwise(variant_valid(v, schema))

    bound = F.get(F.transform(F.array(F.try_parse_json(col)), body), 0)
    return F.when(col.isNull(), F.lit(None).cast("boolean")) \
            .otherwise(bound)


def _inline_refs_for_variant(schema: Any, registry, dialect: str) -> Any:
    """Driver-side $ref inlining for the VARIANT fast path.

    Reuses the table compiler's eager resolver (table.inline_refs,
    reference SchemaRefResolver.scala:196-212 semantics: draft-7 $ref
    replaces sibling keywords; $id scopes honored via the registry).
    The ``$__ref_site``/``$__ref_target`` stamps it leaves for violation
    reporting are stripped — validity is a bare boolean here and the
    stamps would trip keyword-set validators (propertyNames). Returns
    the schema unchanged when there is nothing to inline or when
    inlining fails (recursive ref, unresolvable URI) — the caller's
    VariantUnsupported fallback then routes to the lazy Arrow kernel."""
    from sparkschema.compiler.table import _has_ref, inline_refs

    if not _has_ref(schema):
        return schema
    try:
        from sparkschema.spec.refs import DocumentIndex, RefResolver, Scope
        from sparkschema.spec.registry import sniff_dialect

        # resolve against a CLONE of the caller's index: registering the
        # transient root spec (and its $id scopes) into a long-lived
        # registry would let a stale subschema shadow a later document
        # with the same $id (review find r4)
        idx = registry.index.clone() if registry is not None \
            else DocumentIndex()
        root_uri = "urn:sparkschema:variantcol"
        d = sniff_dialect(schema, dialect) if isinstance(schema, dict) else dialect
        idx.add_document(root_uri, schema, d)
        inlined = inline_refs(schema, RefResolver(idx, d),
                              Scope(schema, root_uri))
    except Exception:  # SpecError (recursive ref) or resolver failures
        return schema

    def strip(s):
        # annotations never land inside enum/const/default/examples
        # (inline_refs doesn't descend into literal values) — don't
        # rewrite those either
        if isinstance(s, dict):
            return {k: (v if k in ("enum", "const", "default", "examples")
                        else strip(v))
                    for k, v in s.items()
                    if k not in ("$__ref_site", "$__ref_target")}
        if isinstance(s, list):
            return [strip(x) for x in s]
        return s

    return strip(inlined)


def json_valid_auto(json_col: Column | str, schema: Any,
                    registry=None, dialect: str | None = None,
                    strict_spark_parse: bool = False) -> Column:
    """VARIANT fast path when the spec compiles; Arrow kernel otherwise.

    PER-ROW hybrid on the fast path: Spark's variant parser REJECTS some
    documents the reference's parser accepts — probed on 4.1: objects
    with duplicate keys (Jackson/Play is last-wins) — so rows where
    ``try_parse_json`` returns NULL on non-NULL text re-validate through
    the Arrow kernel. The kernel UDF's ARGUMENT is gated (NULL for every
    normally-parsed row), so unaffected rows cross Arrow as nulls and the
    kernel body short-circuits; rows both parsers reject stay invalid
    (err.parse.json) on either path.

    The hybrid still attaches one ArrowEvalPython node to the plan (the
    UDF is hoisted out of the CASE branch and sees a NULL per normal
    row). Callers that know their documents are Spark-parsable — or
    accept the documented duplicate-key divergence — pass
    ``strict_spark_parse=True`` for a pure-Catalyst plan."""
    from pyspark.sql import functions as _F

    # $ref: resolve eagerly on the driver (the same compile-time inlining
    # the table compiler uses) so non-recursive ref'd specs stay on the
    # zero-Python VARIANT path; recursive/unresolvable refs fall back to
    # the Arrow kernel, which resolves lazily (SchemaRefResolver.scala).
    dialect = dialect or getattr(registry, "dialect", None) or "draft7"
    vschema = _inline_refs_for_variant(schema, registry, dialect)
    try:
        vcol = variant_valid_column(json_col, vschema)
    except VariantUnsupported:
        from sparkschema.compiler.jsoncol import json_valid_column
        return json_valid_column(json_col, schema, registry, dialect)
    if strict_spark_parse:
        return vcol
    from sparkschema.compiler.jsoncol import json_valid_column
    col = _F.col(json_col) if isinstance(json_col, str) else json_col
    unparsed = col.isNotNull() & _F.try_parse_json(col).isNull()
    kcol = json_valid_column(_F.when(unparsed, col), schema, registry,
                             dialect)
    return _F.when(unparsed, _F.coalesce(kcol, _F.lit(False))) \
             .otherwise(vcol)
