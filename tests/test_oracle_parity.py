"""Mirror of the driver's correctness gate: every registered query with an
oracle is executed on Spark AND DuckDB at sf0.001 and compared on row count,
column names, and order-insensitive canonicalized values.

This is intentionally stricter than "close enough": values are compared
exactly after canonicalization (floats via repr of float64, timestamps via
ISO strings), matching a hash-based comparison.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod
from tools import oracle_preflight as preflight

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_val(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: exact for our rounded aggregates, forgiving
        # of float32→float64 widening artifacts
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon_val(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    # The driver's canonicalizer pandas-sorts result frames and dies on
    # unhashable cells (round-3 red on emb_normalize/emb_quantize) — reject
    # nested output types here so the class of bug never reaches the driver.
    nested = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name}: nested-typed output columns {nested} break the driver's "
        "canonicalizer — emit a canonical scalar (array_join / digest)"
    )
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    rel = con.sql(ORACLE[name])
    ocols = [c.lower() for c in rel.columns]
    # The driver hashes dtype-sensitively: identical values hash apart when
    # the column classes differ (round-3: nested arrays; round-4: DuckDB
    # HUGEINT from SUM(int) vs Spark int64). The shared preflight classifier
    # lints every oracle's class vector against the Spark schema here, so
    # the whole dtype class of driver-red can never recur.
    skew = preflight.diff_key(sdf.schema, rel.columns, rel.types)
    assert not skew, f"{name}: oracle/Spark dtype skew {skew}"
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    a = _canon_rows(scols, srows)
    b = _canon_rows(ocols, orows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Queries without an oracle must at least run and return a schema."""
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
