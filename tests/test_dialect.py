"""MySQL→Spark dialect shim unit tests (driver-side, no Spark needed)."""

from openmrs_module_mamba_etl_spark.functions.dialect import translate_mysql


def test_date_format_tokens():
    out = translate_mysql("SELECT DATE_FORMAT(d, '%Y-%m-%d') FROM t")
    assert "yyyy-MM-dd" in out


def test_date_format_literal_letters_quoted():
    # Literal alpha chars inside a SimpleDateFormat pattern must be quoted.
    out = translate_mysql("SELECT DATE_FORMAT(d, '%Yy%mT') FROM t")
    assert "yyyy'y'MM'T'" in out


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
