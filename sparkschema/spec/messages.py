"""Violation message catalog.

Re-states the reference's localizable message keys
(reference: src/main/resources/messages.txt:1-47 and
src/main/scala/com/eclipsesource/schema/internal/ValidatorMessages.scala:11-53)
so violation rows carry byte-identical messages. The catalog is a plain
dict and may be overridden per-engine (the analog of dropping a
``messages_XX.txt`` on the classpath, reference README.md:148-158).
"""

from __future__ import annotations

# Default catalog. ``{0}``/``{1}`` placeholders follow the reference's
# MessageFormat convention; format via :func:`render`.
DEFAULT_MESSAGES: dict[str, str] = {
    "obj.missing.prop.dep": "Missing property dependency {0}.",
    "obj.max.props": "Too many properties. {0} properties found, but only a maximum of {1} is allowed.",
    "obj.min.props": "Found {0} properties, but a minimum of {1} is required.",
    "obj.additional.props": "Additional properties are not allowed, but found properties {0}.",
    "obj.required.prop": "Property {0} missing.",
    "arr.max": "Too many items. {0} items found, but only a maximum of {1} is allowed.",
    "arr.min": "Found {0} items, but a minimum of {1} is required.",
    "arr.dups": "Found duplicates.",
    "arr.out.of.bounds": "Array index {0} out of bounds.",
    "arr.invalid.index": "Invalid array index {0}.",
    "str.pattern": "''{0}'' does not match pattern ''{1}''.",
    "str.invalid.pattern": "Invalid pattern ''{0}''.",
    "str.min.length": "''{0}'' does not match minimum length of {1}.",
    "str.max.length": "''{0}'' exceeds maximum length of {1}.",
    "str.format": "''{0}'' does not match format {1}.",
    "num.multiple.of": "{0} is not a multiple of {1}.",
    "num.max": "{0} exceeds maximum value of {1}.",
    "num.max.exclusive": "{0} exceeds exclusive maximum value of {1}.",
    "num.min": "{0} is smaller than required minimum value of {1}.",
    "num.min.exclusive": "{0} is smaller than required exclusive minimum value of {1}.",
    "any.not": "Instance matches schema although it must not.",
    "any.all": "Instance does not match all schemas.",
    "any.any": "Instance does not match any of the schemas.",
    "any.one.of.none": "Instance does not match any schema.",
    "any.one.of.many": "Instance matches more than one schema.",
    "any.enum": "Instance is invalid enum value.",
    "any.const": "Instance does not match const value.",
    "comp.no.schema": "No schema applicable.",
    "err.expected.type": "Wrong type. Expected {0}, was {1}.",
    "err.unresolved.ref": "Could not resolve ref {0}.",
    "err.prop.not.found": "Could not find property {0}.",
    "err.ref.expected": "Expected to find ref at {0}.",
    "err.res.scope.id.empty": "Resolution scope ID must not be empty.",
    "err.parse.json": "Could not parse JSON.",
    "err.max.depth": "Maximum recursion depth reached.",
    "err.dependencies.not.found": "Dependency not found.",
    "err.definitions.not.found": "Definition not found.",
    "err.patternProperties.not.found": "Pattern Properties not found.",
    "err.false.schema": "Boolean false schema encountered.",
    "err.contains": "Array does not contain valid item.",
    "err.if.then.else": "Conditional validation failed.",
    # engine-only table-level checks (no reference analog; SURVEY.md §2.4)
    "tbl.unique": "Key {0} is duplicated {1} times.",
    "tbl.ref.orphan": "Value {0} not present in reference table {1}.",
    "tbl.null.fraction": "Null fraction {0} exceeds allowed {1}.",
    "tbl.drift": "Distribution drift detected: statistic {0} exceeds threshold {1}.",
    "tbl.roundtrip.psnr": "Decoded image PSNR {0} dB below minimum {1} dB.",
    "tbl.roundtrip.caption": "Caption differs from reference copy.",
    "tbl.roundtrip.missing": "No reference row for round-trip comparison.",
    "tbl.corrupt.bytes": "Image buffer is corrupt or truncated.",
}


def render(key: str, *args: object, catalog: dict[str, str] | None = None) -> str:
    """Render message ``key`` with positional args (MessageFormat-style).

    Java-MessageFormat parity rules (review find r4 — all three were
    reproduced divergent): quote processing (``''`` → ``'``) applies to
    the TEMPLATE only, never to substituted argument text; substituted
    argument text is never rescanned for placeholders (an instance value
    containing ``{1}`` must not inject the next argument); a partial
    ``catalog`` OVERLAYS the default bundle rather than replacing it
    (resource-bundle fallback — overriding one message must not turn
    every other key into its raw name)."""
    import re as _re

    if catalog is not None and key in catalog:
        template = catalog[key]
    else:
        template = DEFAULT_MESSAGES.get(key, key)
    template = template.replace("''", "'")  # template-level escape only
    parts = _re.split(r"\{(\d+)\}", template)
    out = []
    for j, piece in enumerate(parts):
        if j % 2 == 0:
            out.append(piece)
        else:
            idx = int(piece)
            out.append(_fmt(args[idx]) if idx < len(args)
                       else "{%d}" % idx)
    return "".join(out)


def _fmt(a: object) -> str:
    # Java MessageFormat prints integral numbers without a decimal point
    # and groups thousands with commas; the reference relies on default
    # number formatting.  We keep it minimal: ints bare, floats via repr.
    if isinstance(a, bool):
        return "true" if a else "false"
    if isinstance(a, float) and a.is_integer():
        return format(int(a), ",")
    if isinstance(a, int):
        return format(a, ",")
    return str(a)
