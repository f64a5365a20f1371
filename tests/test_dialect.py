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


def test_date_format_unsupported_token_raises():
    import pytest

    with pytest.raises(ValueError, match="%D"):
        translate_mysql("SELECT DATE_FORMAT(d, '%D') FROM t")


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
