"""MySQL→Spark dialect shim unit tests (driver-side, no Spark needed)."""

from openmrs_module_mamba_etl_spark.functions.dialect import translate_mysql


def test_date_format_tokens():
    out = translate_mysql("SELECT DATE_FORMAT(d, '%Y-%m-%d') FROM t")
    assert "yyyy-MM-dd" in out


def test_date_format_literal_letters_quoted(spark):
    # Literal alpha chars inside a SimpleDateFormat pattern must be quoted
    # (as ONE run — per-char quoting makes '' = escaped quote) and the
    # rewritten SQL must actually execute.
    spark.sql("SELECT timestamp'2024-03-05 13:07:09' AS d")         .createOrReplaceTempView("_dlt")
    out = translate_mysql("SELECT DATE_FORMAT(d, '%Yy%mT') AS f FROM _dlt")
    assert spark.sql(out).collect()[0]["f"] == "2024y03T"
    out = translate_mysql("SELECT DATE_FORMAT(d, '%d of %M') AS f FROM _dlt")
    assert spark.sql(out).collect()[0]["f"] == "05 of March"
    out = translate_mysql("SELECT DATE_FORMAT(d, '%h:%i %p') AS f FROM _dlt")
    assert spark.sql(out).collect()[0]["f"] == "01:07 PM"


def test_date_format_comma_inside_first_arg(spark):
    # the argument scanner must not split on commas inside nested quotes
    out = translate_mysql(
        "SELECT DATE_FORMAT(CONCAT('2024-03-05',' ','13:07:09'), '%Y') AS f"
    )
    assert spark.sql(out).collect()[0]["f"] == "2024"


def test_date_format_nested_first_arg(spark):
    # A DATE_FORMAT nested inside the first argument of another must also
    # get its format literal translated — the scanner recurses into the
    # first argument instead of skipping the whole outer call.
    out = translate_mysql(
        "SELECT DATE_FORMAT(DATE_FORMAT(timestamp'2024-03-05 13:07:09',"
        " '%Y-%m-01'), '%m') AS f"
    )
    assert "%Y" not in out and "%m" not in out
    assert spark.sql(out).collect()[0]["f"] == "03"


def test_date_format_nested_in_non_literal_call(spark):
    # Outer call's second arg is not a plain literal → outer passes
    # through, but the inner call inside its argument list still rewrites.
    out = translate_mysql(
        "SELECT CONCAT(DATE_FORMAT(timestamp'2024-03-05 13:07:09', '%Y'),"
        " '-x') AS f"
    )
    assert "%Y" not in out
    assert spark.sql(out).collect()[0]["f"] == "2024-x"


def test_date_format_three_args_passthrough():
    # Wrong arity: name left alone, scan continues inside the arg list.
    sql = "SELECT DATE_FORMAT(a, b, c) FROM t"
    assert translate_mysql(sql) == sql


def test_date_format_unknown_token_raises():
    # a token MySQL itself does not define must fail loudly, not pass
    # through as a silent literal
    import pytest

    with pytest.raises(ValueError, match="%Q"):
        translate_mysql("SELECT DATE_FORMAT(d, '%Q') FROM t")


def test_date_format_fixed_suffix():
    out = translate_mysql("SELECT DATE_FORMAT(NOW(), '%Y-01-01')")
    assert "yyyy-01-01" in out
    assert "current_timestamp()" in out


def test_curdate_now():
    out = translate_mysql("SELECT CURDATE(), NOW(), SYSDATE()")
    assert out == "SELECT current_date(), current_timestamp(), current_timestamp()"


def test_strings_outside_date_format_untouched():
    sql = "SELECT '%Y' AS lit, CONCAT(a, '%m') FROM t"
    assert translate_mysql(sql) == sql


def test_case_insensitive():
    out = translate_mysql("select curdate(), date_format(d, '%H:%i')")
    assert "current_date()" in out
    assert "HH:mm" in out


def test_char_length_vs_length():
    out = translate_mysql("SELECT LENGTH(x), CHAR_LENGTH(x) FROM t")
    assert out == "SELECT octet_length(x), length(x) FROM t"


def _mode1_week(d):
    """Independent MySQL WEEK(d, 1) oracle via the ISO calendar: mode 1
    shares ISO's Monday/>3-days rule but stays year-local — early-January
    days of the previous ISO year are week 0, and late-December days of
    next year's ISO week 1 keep counting (prior Monday's week + 1)."""
    import datetime

    iso = d.isocalendar()
    if iso[0] == d.year:
        return iso[1]
    if iso[0] < d.year:
        return 0
    return (d - datetime.timedelta(days=7)).isocalendar()[1] + 1


def test_week_tokens_match_mysql_semantics(spark):
    """%U == strftime('%U') (MySQL mode 0), %u == WEEK(d,1) via the
    ISO-derived oracle, %v == ISO week — swept across year boundaries,
    leap years, and every weekday a Jan 1 can fall on (2014-2025 covers
    all seven)."""
    import datetime

    dates = []
    for y in range(2014, 2026):
        for md in [(1, 1), (1, 2), (1, 5), (1, 8), (2, 29), (6, 15),
                   (12, 28), (12, 29), (12, 30), (12, 31)]:
            try:
                dates.append(datetime.date(y, *md))
            except ValueError:
                pass  # non-leap Feb 29
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    df.createOrReplaceTempView("week_golden")
    sql = translate_mysql(
        "SELECT d, DATE_FORMAT(d, '%U') AS u0, DATE_FORMAT(d, '%u') AS u1, "
        "DATE_FORMAT(d, '%v') AS v3, DATE_FORMAT(d, '%Y-w%u') AS mixed "
        "FROM week_golden"
    )
    for r in spark.sql(sql).collect():
        d = r["d"]
        assert r["u0"] == d.strftime("%U"), (d, r["u0"])
        assert r["u1"] == f"{_mode1_week(d):02d}", (d, r["u1"])
        assert r["v3"] == f"{d.isocalendar()[1]:02d}", (d, r["v3"])
        assert r["mixed"] == f"{d.year}-w{_mode1_week(d):02d}", (d, r["mixed"])


def _mode2_week_year(d) -> tuple[int, int]:
    """Python reference for MySQL WEEK(d, 2) and its paired %X year:
    Sunday-first weeks (strftime %U); the week-00 days before the year's
    first Sunday carry the previous year's last week number and year-1."""
    import datetime

    w = int(d.strftime("%U"))
    if w == 0:
        prev = datetime.date(d.year - 1, 12, 31)
        return int(prev.strftime("%U")), d.year - 1
    return w, d.year


def test_week_year_tokens_match_mysql_semantics(spark):
    """%V/%X (WEEK mode 2 + paired year) and %x (ISO week-year paired
    with %v) — swept over EVERY day of 2014-2026 (covers leap years and
    all seven weekdays a Jan 1 / Dec 31 can fall on, so every
    year-boundary carry case appears) plus the boundary stripes around a
    skipped-leap century year (1899-1901, 2099-2101) and the unix epoch
    (1969-1971)."""
    import datetime

    def days(y0, y1):
        d0 = datetime.date(y0, 1, 1)
        return [d0 + datetime.timedelta(days=i)
                for i in range((datetime.date(y1, 1, 1) - d0).days)]

    dates = days(2014, 2027) + days(1899, 1902) + days(1969, 1972) \
        + days(2099, 2102)
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    df.createOrReplaceTempView("week_year_golden")
    sql = translate_mysql(
        "SELECT d, DATE_FORMAT(d, '%V') AS v2, DATE_FORMAT(d, '%X') AS x2, "
        "DATE_FORMAT(d, '%x') AS xi, DATE_FORMAT(d, '%x-w%v') AS iso_label, "
        "DATE_FORMAT(d, '%X/%V') AS sun_label FROM week_year_golden"
    )
    for r in spark.sql(sql).collect():
        d = r["d"]
        w2, y2 = _mode2_week_year(d)
        iso = d.isocalendar()
        assert r["v2"] == f"{w2:02d}", (d, r["v2"])
        assert r["x2"] == f"{y2:04d}", (d, r["x2"])
        assert r["xi"] == f"{iso[0]:04d}", (d, r["xi"])
        assert r["iso_label"] == f"{iso[0]:04d}-w{iso[1]:02d}"
        assert r["sun_label"] == f"{y2:04d}/{w2:02d}"


def test_weekday_and_ordinal_tokens_match_mysql(spark):
    """%w == strftime('%w') (0=Sunday); %D == English ordinal day —
    swept over a full month-plus so every suffix class (1st/2nd/3rd/4th,
    the 11th-13th exceptions, 21st-23rd, 31st) appears."""
    import datetime

    dates = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i)
             for i in range(45)]
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    df.createOrReplaceTempView("wd_golden")
    sql = translate_mysql(
        "SELECT d, DATE_FORMAT(d, '%w') AS wd, DATE_FORMAT(d, '%D') AS od, "
        "DATE_FORMAT(d, 'the %D at w%w') AS mixed FROM wd_golden"
    )

    def suffix(n: int) -> str:
        if n in (11, 12, 13):
            return "th"
        return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")

    for r in spark.sql(sql).collect():
        d = r["d"]
        assert r["wd"] == d.strftime("%w"), (d, r["wd"])
        assert r["od"] == f"{d.day}{suffix(d.day)}", (d, r["od"])
        assert r["mixed"] == f"the {d.day}{suffix(d.day)} at w{d.strftime('%w')}"


def test_date_format_compositional_fuzz(spark):
    """Seeded fuzz over RANDOM compositions of every supported token with
    literal runs: the golden sweeps prove each token alone; this proves
    the compiler's run-flushing — expression tokens interleaved with
    DateTimeFormatter runs and quoted literals in one format string —
    against a per-token Python reference."""
    import datetime
    import random

    def suffix(n: int) -> str:
        if n in (11, 12, 13):
            return "th"
        return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")

    def mode2(d):
        w = int(d.strftime("%U"))
        if w == 0:
            prev = datetime.date(d.year - 1, 12, 31)
            return int(prev.strftime("%U")), d.year - 1
        return w, d.year

    def ref(d: datetime.date, tok: str) -> str:
        iso = d.isocalendar()
        w2, y2 = mode2(d)
        table = {
            "%Y": d.strftime("%Y"), "%y": d.strftime("%y"),
            "%M": d.strftime("%B"), "%m": d.strftime("%m"),
            "%c": str(d.month), "%d": d.strftime("%d"), "%e": str(d.day),
            "%H": "00", "%k": "0", "%h": "12", "%l": "12",
            "%i": "00", "%s": "00", "%S": "00",
            "%j": d.strftime("%j"), "%a": d.strftime("%a"),
            "%W": d.strftime("%A"), "%b": d.strftime("%b"),
            "%T": "00:00:00", "%p": "AM", "%r": "12:00:00 AM",
            "%f": "000000", "%%": "%",
            "%w": d.strftime("%w"), "%D": f"{d.day}{suffix(d.day)}",
            "%U": d.strftime("%U"), "%u": f"{_mode1_week(d):02d}",
            "%v": f"{iso[1]:02d}", "%V": f"{w2:02d}",
            "%X": f"{y2:04d}", "%x": f"{iso[0]:04d}",
        }
        return table[tok]

    tokens = list(
        {"%Y", "%y", "%M", "%m", "%c", "%d", "%e", "%H", "%k", "%h", "%l",
         "%i", "%s", "%S", "%j", "%a", "%W", "%b", "%T", "%p", "%r", "%f",
         "%%", "%w", "%D", "%U", "%u", "%v", "%V", "%X", "%x"}
    )
    tokens.sort()
    literals = ["-", "/", " ", ":", "w", "of ", "T", "'", ", "]
    rng = random.Random(20260815)
    fmts = []
    for _ in range(40):
        n = rng.randint(1, 6)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(tokens))
            if rng.random() < 0.5:
                parts.append(rng.choice(literals))
        fmts.append("".join(parts))

    dates = [datetime.date(2020, 12, 28) + datetime.timedelta(days=i)
             for i in range(10)]
    dates += [datetime.date(2024, rng.randint(1, 12), rng.randint(1, 28))
              for _ in range(5)]
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    df.createOrReplaceTempView("fuzz_golden")

    for fmt in fmts:
        sql_fmt = fmt.replace("'", "''")
        sql = translate_mysql(
            f"SELECT d, DATE_FORMAT(d, '{sql_fmt}') AS out FROM fuzz_golden"
        )
        for r in spark.sql(sql).collect():
            d = r["d"]
            expect, i = [], 0
            while i < len(fmt):
                if fmt[i] == "%" and i + 1 < len(fmt):
                    expect.append(ref(d, fmt[i : i + 2]))
                    i += 2
                else:
                    expect.append(fmt[i])
                    i += 1
            assert r["out"] == "".join(expect), (fmt, d, r["out"])
