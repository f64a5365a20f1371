"""MySQL → Spark SQL dialect shim for the report-query surface.

The reference's ``report_sql.sql_query`` is free-form MySQL executed with
bound parameters (reference: README.md:288-328). Spark SQL accepts most of
that dialect directly (backtick identifiers, DATE()/YEAR(), CASE WHEN,
IFNULL, ...), so the shim only rewrites the constructs whose semantics or
spelling actually differ:

- ``DATE_FORMAT(x, '%Y-%m-%d')`` format tokens: MySQL ``%``-tokens →
  JVM/SimpleDateFormat patterns (reference usage: README.md:321
  ``DATE_FORMAT(NOW(), '%Y-01-01')``).
- ``CURDATE()`` → ``current_date()`` / ``NOW()`` → ``current_timestamp()``
  (reference usage: README.md:313, README.md:321).
- ``RAND(`` → ``rand(`` spelling only; everything else passes through for
  Catalyst to parse.

Literal strings NOT inside a DATE_FORMAT call are never rewritten.
"""

from __future__ import annotations

import re

# MySQL DATE_FORMAT token → Spark (SimpleDateFormat-style) pattern.
# Ordered so multi-char tokens never get shadowed.
_MYSQL_TOKENS = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%M", "MMMM"),
    ("%m", "MM"),
    ("%c", "M"),
    ("%d", "dd"),
    ("%e", "d"),
    ("%H", "HH"),
    ("%k", "H"),
    ("%h", "hh"),
    ("%i", "mm"),
    ("%s", "ss"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%a", "EEE"),
    ("%W", "EEEE"),
    ("%b", "MMM"),
    ("%T", "HH:mm:ss"),
    ("%%", "%"),
]

_FN_REWRITES = [
    (re.compile(r"\bCURDATE\s*\(\s*\)", re.IGNORECASE), "current_date()"),
    (re.compile(r"\bNOW\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bUTC_TIMESTAMP\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bSYSDATE\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bLENGTH\s*\(", re.IGNORECASE), "octet_length("),
    (re.compile(r"\bCHAR_LENGTH\s*\(", re.IGNORECASE), "length("),
]

_DATE_FORMAT_CALL = re.compile(
    r"(DATE_FORMAT\s*\(.*?,\s*')([^']*)('\s*\))", re.IGNORECASE | re.DOTALL
)


def _translate_format(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            repl = next((s for m, s in _MYSQL_TOKENS if m == tok), None)
            if repl is not None:
                out.append(repl)
                i += 2
                continue
        # Literal character inside a SimpleDateFormat pattern: letters must be
        # quoted or they are interpreted as pattern tokens.
        if ch.isalpha():
            out.append(f"'{ch}'")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def translate_mysql(sql: str) -> str:
    """Rewrite a MySQL report query into Spark SQL."""
    out = _DATE_FORMAT_CALL.sub(
        lambda m: m.group(1) + _translate_format(m.group(2)) + m.group(3), sql
    )
    for pat, repl in _FN_REWRITES:
        out = pat.sub(repl, out)
    return out
