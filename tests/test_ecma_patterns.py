"""ECMA-262 pattern dialect shim: known-divergent constructs must behave
like Nashorn's RegExpFactory (reference StringValidators.scala:16-50) on
both the kernel (Python re) and the columnar (Java rlike) paths."""

import pytest
from pyspark.sql import functions as F

from sparkschema.compiler.columns import ColumnCompiler
from sparkschema.spec.ecma_pattern import translate_ecma
from sparkschema.spec.registry import SpecRegistry

# (pattern, value, ecma_matches) for constructs where raw Python/Java regex
# would disagree with ECMA-262
DIVERGENT_CASES = [
    (r"^\d+$", "١٢٣", False),        # ECMA \d is ASCII; Python re is Unicode
    (r"^\w+$", "naïve", False),      # ECMA \w is ASCII
    (r"a$", "a\n", False),           # ECMA $ = end of input, no trailing-\n grace
    (r"a$", "a", True),
    ("\\cJ", "\n", True),            # control escape (Python re lacks \cX)
    (r"^\s$", " ", True),       # NBSP is ECMA whitespace, not Java \s
    (r"^\s$", "　", True),       # ideographic space
    ("[^]", "anything", True),       # ECMA [^] matches any char
    ("x[]y", "xy", False),           # ECMA [] never matches
    (r"^[\d]+$", "42", True),
    # r3: negated shorthands INSIDE classes expand to complement ranges
    (r"^[\D]+$", "١٢٣", True),       # Arabic-Indic digits are not ASCII \d
    (r"^[\D]+$", "42", False),
    (r"^[\W]+$", "ï", True),         # ECMA \W = non-ASCII-word
    (r"^[\S]+$", " ", False),   # NBSP is ECMA whitespace
    (r"^[\S]+$", "xy", True),
    (r"^[\Dx]+$", "x!", True),       # expansion composes with other members
    (r"^[^\D]+$", "42", True),       # ...and under class negation
    (r"^[^\D]+$", "١٢٣", False),
    # r3: \b boundary uses the ECMA ASCII word set
    (r"\bfoo\b", "caféfoo", True),   # é is non-word in ECMA → boundary
    (r"\bfoo\b", "afoo", False),
    (r"\Bfoo", "afoo", True),
    (r"\Bfoo", "éfoo", False),       # é non-word ⇒ position IS a boundary
    # r4: class backspace, named groups/backrefs, ECMA identity escapes
    (r"[\b]", "\x08", True),         # [\b] is BACKSPACE (Java rejects raw)
    (r"x[\b]y", "xby", False),
    (r"(?<nm>ab)\k<nm>", "abab", True),   # named group + backref
    (r"(?<nm>ab)\k<nm>", "abcd", False),
    (r"(?<=a)b", "ab", True),         # lookbehind untouched by the rewrite
    (r"\q+", "qqq", True),            # Annex B identity escape
    (r"\v", "\x0b", True),           # ECMA \v is VT, not Java's \v class
    (r"\v", " ", False),
    (r"\c1x", "\\c1x", True),         # \c + non-letter: literal "\c"
]


def kernel_matches(pattern, value) -> bool:
    reg = SpecRegistry("draft7")
    return not reg.validate({"pattern": pattern}, value)


@pytest.mark.parametrize("pattern,value,expected", DIVERGENT_CASES)
def test_kernel_matches_ecma_semantics(pattern, value, expected):
    assert kernel_matches(pattern, value) is expected, (pattern, value)


def test_columnar_matches_ecma_semantics(spark):
    cc = ColumnCompiler()
    df = spark.createDataFrame(
        [(i, v) for i, (_, v, _) in enumerate(DIVERGENT_CASES)],
        "i int, s string")
    cols = [cc.compile_valid({"pattern": p}, F.col("s"),
                             df.schema["s"].dataType).alias(f"p{i}")
            for i, (p, _, _) in enumerate(DIVERGENT_CASES)]
    got = {r.i: r for r in df.select("i", *cols).collect()}
    for i, (p, v, expected) in enumerate(DIVERGENT_CASES):
        assert bool(got[i][f"p{i}"]) is expected, (p, v)


def test_java_lone_brace_escaped():
    # ECMA treats a dangling '{' as a literal; Java regex rejects it
    jpat, _ = translate_ecma("a{x", "java")
    assert jpat == r"a\{x"
    jpat2, _ = translate_ecma("a{2,3}", "java")
    assert jpat2 == "a{2,3}"  # real quantifiers untouched


def test_formerly_warned_constructs_now_translate():
    # r3 (VERDICT r2 #7): in-class \D/\S/\W and the ASCII \b boundary are
    # fully bridged — no warnings remain for them
    import re as _re

    out, warns = translate_ecma(r"\bfoo\b", "python")
    assert warns == [] and "(?<" in out
    _re.compile(out)
    out2, warns2 = translate_ecma(r"[\D]", "python")
    assert warns2 == []
    # ECMA \D = non-ASCII-digit: é AND the Arabic-Indic digit ٣ are in it
    # (raw Python \D would exclude ٣ — the bridged divergence), 5 is not
    rx = _re.compile(out2)
    assert rx.match("é") and rx.match("٣") and not rx.match("5")
    out3, warns3 = translate_ecma(r"[\S]", "java")
    assert warns3 == [] and "\\x{" in out3   # full-codepoint-range endpoint
    _, none = translate_ecma(r"^[a-z]+$", "python")
    assert none == []


def test_translation_preserves_classes_and_escapes():
    out, _ = translate_ecma(r"[a\]b]\$x$", "python")
    # escaped ] stays in class; escaped $ stays literal; final $ anchors input end
    assert out == r"[a\]b]\$x\Z"


def test_in_class_shorthand_adjacent_to_dash_passthrough(spark):
    """Self-review r2: expanding \\s/\\d inside a class next to '-' would
    fabricate an out-of-order range ('[...\\ufeff-a]') that Java rejects at
    runtime — such patterns must pass through (with a warning) and still
    evaluate with ECMA-compatible membership for ASCII inputs."""
    pat = r"^[\s-a]+$"
    jpat, warns = translate_ecma(pat, "java")
    assert "\\-" in jpat and not warns      # dash escaped; fully bridged
    import re as _re
    out, _ = translate_ecma(pat, "python")
    rx = _re.compile(out)                   # must COMPILE, not crash
    assert rx.search(" -a")
    cc = ColumnCompiler()
    df = spark.createDataFrame([(1, " -a"), (2, "zz")], "i int, s string")
    got = {r.i: r.ok for r in df.select(
        "i", cc.compile_valid({"pattern": pat}, F.col("s"),
                              df.schema["s"].dataType).alias("ok")).collect()}
    assert got == {1: True, 2: False}
    jpat2, _ = translate_ecma(r"[x-\d]", "python")
    _re.compile(jpat2)                      # adjacency guard on the right side


def test_dollar_anchors_every_alternative():
    """Self-review r2: '$' must be ECMA end-of-input in EVERY position,
    not only pattern-final — '^a$|^b$' previously left the first
    alternative with trailing-newline grace."""
    assert not kernel_matches(r"^a$|^b$", "a\n")
    assert kernel_matches(r"^a$|^b$", "a")
    assert kernel_matches(r"^a$|^b$", "b")
    out, _ = translate_ecma(r"^a$|^b$", "java")
    assert out == r"^a\z|^b\z"


def test_bridged_patterns_emit_no_userwarning(spark):
    import warnings as w

    from sparkschema.spec.ecma_pattern import translate_ecma_checked

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        translate_ecma_checked(r"\bunique-probe-xyzzy\b", "python")
        translate_ecma_checked(r"[\D\S\W]", "python")
        translate_ecma_checked(r"[\S]", "java")
    assert not [x for x in rec if issubclass(x.category, UserWarning)], \
        [str(x.message) for x in rec]
