"""ECMA-262 regex dialect shim.

The reference compiles ``pattern`` / ``patternProperties`` with Nashorn's
ECMAScript RegExpFactory (StringValidators.scala:16-50), while this engine
evaluates patterns with Python ``re`` (kernel) and Java ``java.util.regex``
(Catalyst ``rlike``). The three dialects agree on the whole golden fixture
corpus, but diverge on documented constructs. :func:`translate_ecma`
rewrites the common divergent constructs at compile time and reports the
ones it cannot bridge as warnings (the divergence-detection path).

Dialect table (construct → ECMA meaning → untranslated engine behavior):

====================  ==============================  =========================
construct             ECMA-262                        Python / Java if untranslated
====================  ==============================  =========================
``\\d \\w`` (no u-flag)  ASCII ``[0-9]``/``[A-Za-z0-9_]``  Python: Unicode digits/words
``\\s``                 Unicode WhiteSpace + BOM        Java: ASCII-only ``[ \\t\\n\\x0B\\f\\r]``
``$`` (no m-flag)     end of input ONLY               Python/Java: also before a
                                                      trailing newline
``\\cX``               control char (X mod 32)         Python: error
``[]``                never matches                   Python: unterminated class
``[^]``               matches anything                Python: unterminated class
lone ``{``            literal brace                   Java: dangling-metachar error
``\\b`` in a class     backspace (\\x08)               same (no action needed)
``\\b`` boundary       ASCII-word boundary             Python: Unicode boundary —
                                                      WARNED, not translated
====================  ==============================  =========================

Escapes inside character classes and quantifier braces are scanned
context-aware; anything beyond this table passes through untouched (and
the corpus shows agreement there).
"""

from __future__ import annotations

# ECMA WhiteSpace ∪ LineTerminator (incl. NBSP + BOM), for translating \s/\S
_ECMA_WS = (" \\t\\n\\x0b\\f\\r\\u00a0\\u1680\\u2000-\\u200a"
            "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff")


def translate_ecma(pattern: str, target: str = "python") -> tuple[str, list[str]]:
    """Rewrite an ECMA-262 pattern for ``target`` (``python`` | ``java``).

    Returns ``(translated_pattern, warnings)`` — warnings name constructs
    whose semantics may still diverge after translation.
    """
    out: list[str] = []
    warnings: list[str] = []
    i, n = 0, len(pattern)
    in_class = False

    def peek(k: int = 0) -> str:
        return pattern[i + k] if i + k < n else ""

    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "c" and i + 2 < n and pattern[i + 2].isalpha():
                # \cX control escape → \xNN (Python lacks \cX)
                out.append("\\x%02x" % (ord(pattern[i + 2].upper()) % 32))
                i += 3
                continue
            if nxt in "dD" and target == "python":
                # ECMA \d is ASCII; Python str patterns are Unicode
                if in_class and nxt == "d":
                    out.append("0-9")
                elif in_class:
                    warnings.append("\\D inside a character class is passed "
                                    "through (not expressible as a set)")
                    out.append(ch + nxt)
                else:
                    out.append("[0-9]" if nxt == "d" else "[^0-9]")
                i += 2
                continue
            if nxt in "wW" and target == "python":
                if in_class and nxt == "w":
                    out.append("A-Za-z0-9_")
                elif in_class:
                    warnings.append("\\W inside a character class is passed "
                                    "through (not expressible as a set)")
                    out.append(ch + nxt)
                else:
                    out.append("[A-Za-z0-9_]" if nxt == "w" else "[^A-Za-z0-9_]")
                i += 2
                continue
            if nxt in "sS":
                # pin the exact ECMA whitespace set on both targets
                if in_class and nxt == "S":
                    warnings.append("\\S inside a character class is passed "
                                    "through (not expressible as a set)")
                    out.append(ch + nxt)
                elif in_class:
                    out.append(_ECMA_WS)
                else:
                    out.append(("[%s]" if nxt == "s" else "[^%s]") % _ECMA_WS)
                i += 2
                continue
            if nxt in "bB" and not in_class and target == "python":
                warnings.append("\\b word boundary stays Unicode-aware in "
                                "Python (ECMA uses the ASCII word set)")
            out.append(ch + nxt)
            i += 2
            continue

        if not in_class:
            if ch == "[":
                if peek(1) == "]":        # ECMA []: never matches
                    out.append("[^\\s\\S]")
                    i += 2
                    continue
                if peek(1) == "^" and peek(2) == "]":   # ECMA [^]: anything
                    out.append("[\\s\\S]")
                    i += 3
                    continue
                in_class = True
                out.append(ch)
                i += 1
                continue
            if ch == "$" and i == n - 1:
                # ECMA $ (no m-flag) anchors END OF INPUT; Python $ and
                # Java $ also match before one trailing newline
                out.append("\\Z" if target == "python" else "\\z")
                i += 1
                continue
            if ch == "{":
                # lone { is a literal in ECMA; Java rejects a dangling brace
                import re as _re
                if target == "java" and not _re.match(
                        r"\{\d+(,\d*)?\}", pattern[i:]):
                    out.append("\\{")
                    i += 1
                    continue
            out.append(ch)
            i += 1
            continue

        # inside a character class
        if ch == "]":
            in_class = False
        out.append(ch)
        i += 1

    return "".join(out), warnings
