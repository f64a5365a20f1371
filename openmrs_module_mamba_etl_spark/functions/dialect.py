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
    ("%p", "a"),
    ("%l", "h"),
    ("%r", "hh:mm:ss a"),
    ("%f", "SSSSSS"),
    ("%%", "%"),
]

#: Week-number tokens have NO DateTimeFormatter mapping (Spark bans the
#: week-based pattern letters w/W/Y), but three of them have exact
#: expression rewrites, so DATE_FORMAT calls containing them compile to a
#: concat() of date_format runs and weekofyear-family arithmetic instead:
#:   %v  ISO-8601 week (Monday, 01-53)            = weekofyear()
#:   %u  MySQL WEEK(d,1) (Monday, 00-53, week 1 = first week with >3
#:       days this year; year-end partial weeks keep counting 53)
#:   %U  MySQL WEEK(d,0) (Sunday, 00-53, days before the first Sunday
#:       are week 00) — identical to C/Python strftime %U
#:   %V  MySQL WEEK(d,2) (Sunday, 01-53): same weeks as %U, but days
#:       before the year's first Sunday carry the PREVIOUS year's last
#:       week number instead of week 00
#:   %X  the 4-digit year paired with %V (year-1 exactly on those
#:       carried-over January days)
#:   %x  the 4-digit ISO week-year paired with %v (the year of the
#:       week's Thursday)
_WEEK_TOKENS = {"%U", "%u", "%v", "%V", "%X", "%x"}

#: Tokens compiled to expression rewrites (not DateTimeFormatter
#: patterns): the week numbers above plus two exactly-mappable scalars —
#: %w (weekday 0=Sunday = dayofweek()-1) and %D (day with English
#: ordinal suffix, a pure CASE on the day number).
_EXPR_TOKENS = _WEEK_TOKENS | {"%w", "%D"}

_FN_REWRITES = [
    (re.compile(r"\bCURDATE\s*\(\s*\)", re.IGNORECASE), "current_date()"),
    (re.compile(r"\bNOW\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bUTC_TIMESTAMP\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bSYSDATE\s*\(\s*\)", re.IGNORECASE), "current_timestamp()"),
    (re.compile(r"\bLENGTH\s*\(", re.IGNORECASE), "octet_length("),
    (re.compile(r"\bCHAR_LENGTH\s*\(", re.IGNORECASE), "length("),
]

def _week_number_expr(d: str, tok: str) -> str:
    """Spark SQL expression for one week token over date expression ``d``.

    ``%v`` is weekofyear() verbatim. ``%U``/``%u`` count whole weeks from
    the year's first Sunday/Monday: days before it are week 0, and for
    ``%u`` the partial week before the first Monday promotes to week 1
    (shifting everything by one) when it holds more than 3 days of this
    year — MySQL WEEK mode 1's rule, which also makes late-December days
    that ISO hands to next year's week 1 keep counting 53 here. Verified
    against Python's strftime('%U') / an ISO-derived mode-1 oracle across
    year boundaries in tests/test_dialect.py.

    ``%V``/``%X`` are MySQL WEEK mode 2 and its paired week-year: the
    same Sunday-first weeks as ``%U``, except the January days before the
    year's first Sunday — week 00 in mode 0 — belong to the PREVIOUS
    year's last week, so they take the mode-0 week number of that year's
    Dec 31 and ``%X`` = year−1 (every other day: ``%X`` = year). ``%x``
    is the ISO week-year paired with ``%v``: the calendar year of the
    date's week's Thursday — year(d + (3 − weekday(d))), weekday()
    Monday-based. Golden-swept against Python references (strftime-based
    mode-2 fold, isocalendar()) in tests/test_dialect.py.
    """
    if tok == "%v":
        n = f"weekofyear({d})"
    elif tok == "%U":
        s = f"((8 - dayofweek(trunc({d}, 'YEAR'))) % 7)"
        n = (
            f"(CASE WHEN dayofyear({d}) <= {s} THEN 0 "
            f"ELSE (dayofyear({d}) - {s} - 1) div 7 + 1 END)"
        )
    elif tok == "%u":
        m = f"((9 - dayofweek(trunc({d}, 'YEAR'))) % 7)"
        n = (
            f"(CASE WHEN dayofyear({d}) <= {m} THEN 0 "
            f"ELSE (dayofyear({d}) - {m} - 1) div 7 + 1 END "
            f"+ CASE WHEN {m} >= 4 THEN 1 ELSE 0 END)"
        )
    elif tok in ("%V", "%X"):
        s = f"((8 - dayofweek(trunc({d}, 'YEAR'))) % 7)"
        prev = f"date_sub(trunc({d}, 'YEAR'), 1)"  # Dec 31 of year-1
        sp = f"((8 - dayofweek(trunc({prev}, 'YEAR'))) % 7)"
        if tok == "%V":
            n = (
                f"(CASE WHEN dayofyear({d}) <= {s} "
                f"THEN (dayofyear({prev}) - {sp} - 1) div 7 + 1 "
                f"ELSE (dayofyear({d}) - {s} - 1) div 7 + 1 END)"
            )
        else:  # %X: the year %V's week belongs to
            n = (
                f"(CASE WHEN dayofyear({d}) <= {s} THEN year({d}) - 1 "
                f"ELSE year({d}) END)"
            )
            return f"lpad(cast({n} as string), 4, '0')"
    else:  # %x: ISO week-year = year of the ISO week's Thursday
        n = f"year(date_add({d}, 3 - weekday({d})))"
        return f"lpad(cast({n} as string), 4, '0')"
    return f"lpad(cast({n} as string), 2, '0')"


def _has_week_tokens(fmt: str) -> bool:
    """True when fmt contains any expression-rewrite token (week numbers,
    %w weekday, %D ordinal day)."""
    i = 0
    while i < len(fmt) - 1:
        if fmt[i] == "%":
            if fmt[i : i + 2] in _EXPR_TOKENS:
                return True
            i += 2
        else:
            i += 1
    return False


def _expr_token(d: str, tok: str) -> str:
    """Expression for one non-DateTimeFormatter token over date ``d``."""
    if tok in _WEEK_TOKENS:
        return _week_number_expr(d, tok)
    if tok == "%w":
        # MySQL %w: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday.
        return f"cast(dayofweek({d}) - 1 as string)"
    # %D: day of month with English ordinal suffix (1st, 2nd, 3rd, 4th,
    # ..., 11th-13th, 21st, 22nd, 23rd, 31st).
    day = f"dayofmonth({d})"
    return (
        f"concat(cast({day} as string), "
        f"CASE WHEN {day} IN (11, 12, 13) THEN 'th' "
        f"WHEN {day} % 10 = 1 THEN 'st' "
        f"WHEN {day} % 10 = 2 THEN 'nd' "
        f"WHEN {day} % 10 = 3 THEN 'rd' ELSE 'th' END)"
    )


def _format_to_expr(first_arg: str, fmt: str) -> str:
    """Compile DATE_FORMAT(first_arg, fmt) containing week tokens into a
    concat() of plain date_format() runs and week-number expressions."""
    d = f"({first_arg.strip()})"
    parts: list[str] = []
    run: list[str] = []

    def flush_run() -> None:
        if run:
            pat = _translate_format("".join(run)).replace("'", "''")
            parts.append(f"date_format({d}, '{pat}')")
            run.clear()

    i = 0
    while i < len(fmt):
        tok = fmt[i : i + 2]
        if fmt[i] == "%" and tok in _EXPR_TOKENS:
            flush_run()
            parts.append(_expr_token(d, tok))
            i += 2
        elif fmt[i] == "%" and i + 1 < len(fmt):
            run.append(tok)
            i += 2
        else:
            run.append(fmt[i])
            i += 1
    flush_run()
    if len(parts) == 1:
        return parts[0]
    return "concat(" + ", ".join(parts) + ")"


def _translate_format(fmt: str) -> str:
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if not literal:
            return
        run = "".join(literal)
        literal.clear()
        # One quoted run per stretch of literal text: quoting letters one
        # at a time would put '' between neighbors, which
        # DateTimeFormatter reads as an ESCAPED QUOTE ('o''f' -> o'f).
        if any(c.isalpha() for c in run) or "'" in run:
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            repl = next((s for m, s in _MYSQL_TOKENS if m == tok), None)
            if repl is not None:
                flush()
                out.append(repl)
                i += 2
                continue
            raise ValueError(f"unknown MySQL DATE_FORMAT token {tok!r}")
        literal.append(ch)
        i += 1
    flush()
    return "".join(out)


def _rewrite_date_format_calls(sql: str) -> str:
    """Translate the format literal of every DATE_FORMAT(expr, 'fmt') call.

    A paren/quote-aware scan — not a regex — finds the top-level argument
    comma, so a first argument containing quoted commas
    (``DATE_FORMAT(CONCAT('a','b'), '%Y')``) is never mis-split.
    Calls whose second argument is not a plain string literal pass through
    untouched.
    """
    out = []
    i = 0
    lower = sql.lower()
    while True:
        j = lower.find("date_format", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        # must be a standalone identifier followed by (
        before_ok = j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")
        k = j + len("date_format")
        while k < len(sql) and sql[k].isspace():
            k += 1
        if not before_ok or k >= len(sql) or sql[k] != "(":
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        # scan the argument list, tracking depth and single-quoted strings
        depth, pos, in_str = 1, k + 1, False
        top_commas: list[int] = []
        while pos < len(sql) and depth > 0:
            c = sql[pos]
            if in_str:
                if c == "'":
                    # '' is an escaped quote inside the literal
                    if pos + 1 < len(sql) and sql[pos + 1] == "'":
                        pos += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_commas.append(pos)
            pos += 1
        close = pos - 1  # index of the matching ')'
        if depth != 0:
            # unterminated call — emit the rest verbatim
            out.append(sql[i:pos])
            i = pos
            continue
        if len(top_commas) != 1:
            # not the two-arg shape: emit up to the open paren and resume
            # INSIDE the call so nested DATE_FORMATs in its arguments are
            # still found
            out.append(sql[i : k + 1])
            i = k + 1
            continue
        second = sql[top_commas[0] + 1 : close].strip()
        if len(second) >= 2 and second[0] == "'" and second[-1] == "'":
            fmt = second[1:-1].replace("''", "'")
            # recurse into the first argument (nested DATE_FORMAT keeps its
            # own MySQL literal otherwise)
            first = _rewrite_date_format_calls(sql[k + 1 : top_commas[0]])
            if _has_week_tokens(fmt):
                # week tokens cannot live in a DateTimeFormatter pattern
                # (Spark bans w/W/Y): the whole call compiles to a concat
                # of date_format runs + weekofyear-family arithmetic
                out.append(sql[i:j])
                out.append(_format_to_expr(first, fmt))
            else:
                translated = _translate_format(fmt).replace("'", "''")
                out.append(sql[i : k + 1])
                out.append(first)
                out.append(f", '{translated}')")
            i = pos
        else:
            # second arg not a plain literal: leave this call's name in
            # place but keep scanning inside its argument list
            out.append(sql[i : k + 1])
            i = k + 1


def translate_mysql(sql: str) -> str:
    """Rewrite a MySQL report query into Spark SQL."""
    out = _rewrite_date_format_calls(sql)
    for pat, repl in _FN_REWRITES:
        out = pat.sub(repl, out)
    return out
