"""JSON value model: type lattice, deep equality, canonicalization.

Semantics mirror the reference's Play-JSON value model (SURVEY.md §1.1):

- types: string / number / boolean / object / array / null
  (reference: internal/SchemaUtil.scala:41-50 ``typeOfAsString``);
- numbers are arbitrary precision — ``integer`` is the *predicate*
  ``isWhole``, not a storage type
  (reference: internal/draft4/constraints/NumberConstraints4.scala:30-43);
- deep equality is JSON equality with BigDecimal numeric equality
  (``1.0 == 1.00 == 1``) but NO cross-type coercion (``1 != true``,
  ``0 != false``) — exercised by the reference fixture
  src/test/resources/draft4/uniqueItems.json.

Python note: ``bool`` subclasses ``int``, so every type test checks
``bool`` first.
"""

from __future__ import annotations

import json
import math
from decimal import Decimal
from typing import Any

# ---------------------------------------------------------------------------
# parsing

def parse_json(text: str) -> Any:
    """Parse JSON with exact decimal numbers (BigDecimal parity).

    ``parse_float=Decimal`` keeps ``0.0075`` exact, matching the
    reference's ``JsNumber(BigDecimal)`` so ``multipleOf`` and numeric
    equality behave decimal-exactly.
    """
    return json.loads(text, parse_float=Decimal)


# ---------------------------------------------------------------------------
# type lattice

def json_type(v: Any) -> str:
    """Name of the JSON type of ``v`` (reference typeOfAsString)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float, Decimal)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, (list, tuple)):
        return "array"
    raise TypeError(f"not a JSON value: {type(v)!r}")


def is_number(v: Any) -> bool:
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def is_integer_valued(v: Any) -> bool:
    """The ``integer`` type predicate: a number with no fractional part
    (reference JsNumber.isWhole)."""
    if not is_number(v):
        return False
    if isinstance(v, int):
        return True
    if isinstance(v, Decimal):
        return v == v.to_integral_value()
    return float(v).is_integer()


def matches_type(v: Any, type_name: str) -> bool:
    """Does ``v`` inhabit schema type ``type_name``?"""
    t = json_type(v)
    if type_name == "integer":
        return t == "number" and is_integer_valued(v)
    if type_name == "number":
        return t == "number"
    return t == type_name


def as_decimal(v: Any) -> Decimal:
    """Exact decimal view of a JSON number.

    Floats below 2^53 go through shortest repr — the canonical decimal a
    user wrote (``0.1`` stays ``0.1``, not its 55-digit binary expansion).
    At/above 2^53 every double is a whole number and shortest repr is
    LOSSY as an integer (and Java 17's Double.toString disagrees with
    Python's repr in the last digit for some values), so the exact binary
    integer is the only unambiguous view — both engine paths use it."""
    if isinstance(v, Decimal):
        return v
    if isinstance(v, int) and not isinstance(v, bool):
        return Decimal(v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            raise ValueError("non-finite number in JSON value")
        if abs(v) >= 2.0 ** 53:
            return Decimal(v)  # exact: the double IS this integer
        return Decimal(repr(v))
    raise TypeError(f"not a JSON number: {v!r}")


# ---------------------------------------------------------------------------
# string length (grapheme-cluster approximation)

def grapheme_length(s: str) -> int:
    """Length in grapheme clusters, matching the reference's
    ``java.text.BreakIterator.getCharacterInstance`` exactly on its
    observed rules (StringValidators.scala:126-132; probed on the same
    Java 17 this sandbox ships):

    - non-leading combining marks (Mn/Me/Mc, incl. variation selectors)
      fold into the previous cluster;
    - ``\\r\\n`` is ONE cluster;
    - ZWJ does NOT glue: legacy (not extended) grapheme clustering, so an
      emoji family sequence counts every emoji AND every joiner
      (man+ZWJ+woman+ZWJ+girl = 5 — Java-verified), regional-indicator
      flags count per codepoint, skin-tone modifiers count separately;
    - astral codepoints are one cluster (Python strings are already
      codepoint-indexed).

    Known residual: decomposed conjoining Hangul jamo (L+V+T) count per
    jamo here, one cluster in ICU — precomposed Hangul (the normal form)
    is unaffected."""
    import unicodedata

    n = 0
    prev = ""
    for ch in s:
        if prev == "\r" and ch == "\n":
            prev = ch
            continue
        if n > 0 and unicodedata.category(ch) in ("Mn", "Me", "Mc"):
            prev = ch
            continue
        n += 1
        prev = ch
    return n


# ---------------------------------------------------------------------------
# deep equality & canonical form

def normalize_exact(d: Decimal) -> Decimal:
    """Trailing-zero-stripping normalize that NEVER rounds.

    ``Decimal.normalize()`` applies the ambient context precision (28
    digits by default), silently ROUNDING wider literals — e.g. a 37-digit
    bound became ``1E+20`` and compared equal to the double ``1e20``
    (fuzz-found r3). The reference's BigDecimal equality/arithmetic never
    rounds, so every normalize in the engine must be exact."""
    import decimal as _dec

    if d == 0:
        return Decimal(0)
    return d.normalize(_dec.Context(prec=max(1, len(d.as_tuple().digits))))


def canonical(v: Any) -> Any:
    """Hashable canonical form implementing JSON deep-equality.

    Two JSON values are equal iff their canonical forms are ``==``.
    Numbers normalize exactly so ``1.0 ≡ 1.00 ≡ 1``; booleans are tagged
    distinctly from numbers so ``1 ≢ true``.
    """
    if v is None:
        return ("z",)
    if isinstance(v, bool):
        return ("b", v)
    if is_number(v):
        d = normalize_exact(as_decimal(v))
        return ("n", d)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canonical(x) for x in v))
    if isinstance(v, dict):
        return ("o", tuple(sorted((k, canonical(x)) for k, x in v.items())))
    raise TypeError(f"not a JSON value: {type(v)!r}")


def json_equal(a: Any, b: Any) -> bool:
    return canonical(a) == canonical(b)


# ---------------------------------------------------------------------------
# rendering (for violation ``value`` fields and canonical string output)

def dump_json(v: Any) -> str:
    """Compact JSON text of a value (Decimal-safe, stable key order off —
    object key order is preserved as parsed, matching Play-JSON output)."""
    return json.dumps(v, default=_decimal_default, separators=(",", ":"), ensure_ascii=False)


def dump_json_exact(v: Any) -> str:
    """Lossless JSON text: ``Decimal`` renders as its exact decimal literal
    (``0.5`` stays ``0.5``, ``5E+33`` stays ``5E+33`` — both valid JSON
    numbers), so ``parse_json(dump_json_exact(v))`` round-trips numerics
    bit-exactly. Used to broadcast schema/registry documents to executors
    (BigDecimal parity for ``multipleOf``/bounds — the reference keeps
    ``JsNumber(BigDecimal)`` end-to-end, SchemaValidator.scala:84-92)."""
    def enc(x: Any) -> str:
        if x is None:
            return "null"
        if isinstance(x, bool):
            return "true" if x else "false"
        if isinstance(x, Decimal):
            return str(x)  # exact decimal literal; JSON grammar allows E-notation
        if isinstance(x, (int, float)):
            return json.dumps(x)
        if isinstance(x, str):
            return json.dumps(x, ensure_ascii=False)
        if isinstance(x, (list, tuple)):
            return "[" + ",".join(enc(i) for i in x) + "]"
        if isinstance(x, dict):
            return "{" + ",".join(
                f"{json.dumps(str(k), ensure_ascii=False)}:{enc(val)}"
                for k, val in x.items()) + "}"
        raise TypeError(f"not a JSON value: {type(x)!r}")
    return enc(v)


def canonical_json(v: Any) -> str:
    """Canonical JSON text: sorted keys + normalized numbers. Equal JSON
    values (per :func:`json_equal`) render identically — usable as a
    grouping/broadcast key for enum membership on complex values."""
    return json.dumps(_canon_value(v), default=_decimal_default,
                      separators=(",", ":"), sort_keys=True, ensure_ascii=False)


def _canon_value(v: Any) -> Any:
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if is_number(v):
        d = normalize_exact(as_decimal(v))
        if d == d.to_integral_value() and abs(d.adjusted()) < 18:
            return int(d)
        return float(d)
    if isinstance(v, (list, tuple)):
        return [_canon_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon_value(x) for k, x in v.items()}
    raise TypeError(f"not a JSON value: {type(v)!r}")


def _decimal_default(o: Any) -> Any:
    if isinstance(o, Decimal):
        return int(o) if o == o.to_integral_value() else float(o)
    raise TypeError(f"not JSON serializable: {type(o)!r}")
