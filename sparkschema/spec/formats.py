"""Built-in string/number format checkers (pure Python, executor-safe).

Re-states the reference's format registry
(reference: internal/validators/DefaultFormats.scala:18-29) with the same
contract: a format constrains only its own JSON type; an **unknown format
name passes** (StringValidators.scala:95-124, None ⇒ Success at line 120).

Used by the vectorized JSON batch validator; the Catalyst compiler has a
parallel Column-expression registry in
:mod:`sparkschema.compiler.formats_sql`.
"""

from __future__ import annotations

import ipaddress
import re
from datetime import datetime
from typing import Any, Callable
from urllib.parse import urlsplit

from sparkschema.spec.jsonvalue import as_decimal, is_number

# regexes lifted from the public JSON-Schema ecosystem conventions the
# reference also uses (DefaultFormats.scala:70-103)
HOSTNAME_RE = re.compile(
    r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
    r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$"
)
EMAIL_RE = re.compile(r"""^[a-zA-Z0-9\.!#$%&'*+/=?^_`{|}~\-]+@[a-zA-Z0-9](?:[a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?)*$""")
UUID_RE = re.compile(r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


def _fmt_datetime(v: Any) -> bool:
    if not isinstance(v, str):
        return True
    s = v.replace("Z", "+00:00").replace("z", "+00:00")
    try:
        dt = datetime.fromisoformat(s)
        # an OFFSET is required: the reference parses with
        # OffsetDateTime.parse and the SQL twin's patterns mandate XXX —
        # fromisoformat alone accepted naive datetimes (review find r4)
        return ("T" in v or "t" in v) and dt.tzinfo is not None
    except ValueError:
        return False


_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _fmt_date(v: Any) -> bool:
    if not isinstance(v, str):
        return True
    # RFC 3339 full-date requires zero padding; strptime alone accepted
    # '2020-1-1', diverging from the SQL twin's anchored regex (review r4)
    if not _DATE_RE.match(v):
        return False
    try:
        datetime.strptime(v, "%Y-%m-%d")
        return True
    except ValueError:
        return False


def _fmt_ipv4(v: Any) -> bool:
    if not isinstance(v, str):
        return True
    try:
        ipaddress.IPv4Address(v)
        return True
    except ValueError:
        return False


def _fmt_ipv6(v: Any) -> bool:
    if not isinstance(v, str):
        return True
    try:
        ipaddress.IPv6Address(v)
        return True
    except ValueError:
        return False


def _fmt_uri(v: Any) -> bool:
    # strict URL parse (the reference uses galimatias,
    # DefaultFormats.scala:62-68): whitespace is not a valid URI char
    if not isinstance(v, str):
        return True
    if any(c.isspace() for c in v):
        return False
    try:
        parts = urlsplit(v)
        return bool(parts.scheme)
    except ValueError:
        return False


def _fmt_hostname(v: Any) -> bool:
    return not isinstance(v, str) or (len(v) <= 253 and HOSTNAME_RE.match(v) is not None)


def _fmt_email(v: Any) -> bool:
    return not isinstance(v, str) or EMAIL_RE.match(v) is not None


def _fmt_uuid(v: Any) -> bool:
    return not isinstance(v, str) or UUID_RE.match(v) is not None


def _fmt_regex(v: Any) -> bool:
    if not isinstance(v, str):
        return True
    try:
        re.compile(v)
        return True
    except re.error:
        return False


def _fmt_int32(v: Any) -> bool:
    if not is_number(v):
        return True
    d = as_decimal(v)
    return d == d.to_integral_value() and INT32_MIN <= d <= INT32_MAX


def _fmt_int64(v: Any) -> bool:
    if not is_number(v):
        return True
    d = as_decimal(v)
    return d == d.to_integral_value() and INT64_MIN <= d <= INT64_MAX


DEFAULT_FORMATS: dict[str, Callable[[Any], bool]] = {
    "date-time": _fmt_datetime,
    "date": _fmt_date,
    "ipv4": _fmt_ipv4,
    "ipv6": _fmt_ipv6,
    "uri": _fmt_uri,
    "hostname": _fmt_hostname,
    "email": _fmt_email,
    "uuid": _fmt_uuid,
    "regex": _fmt_regex,
    "int32": _fmt_int32,
    "int64": _fmt_int64,
}
