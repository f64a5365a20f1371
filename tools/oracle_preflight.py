"""Oracle dtype preflight: diff every oracle's DuckDB result dtypes against
the Spark query's schema BEFORE the driver's hash gate sees them.

The driver canonicalizes result frames dtype-sensitively: two result sets
with bit-identical values hash apart when the column *types* differ in ways
pandas preserves. Three rounds of driver reds were all this class:

- round 3: Spark array<float> columns (unhashable in pandas sort)
- round 4: DuckDB HUGEINT from SUM(int) (int128 != int64 hash)

This tool generalizes the lesson: map both sides onto a coarse "hash class"
(int / float / decimal(scale) / string / date / timestamp / bool / binary)
and flag any oracle whose class vector differs from Spark's, plus the
always-fatal classes (int128, nested types). Run standalone:

    python tools/oracle_preflight.py [sf_dir]

prints one JSON report line and exits nonzero on violations. The parity
suite (tests/test_oracle_parity.py) imports the classifiers so every CI run
lints the whole registry at zero extra cost.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- classes

_DUCK_INT = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE"}


def duck_hash_class(type_str: str) -> str:
    """Coarse hash class for a DuckDB type string (str(rel.types[i]))."""
    t = str(type_str).upper().strip()
    if "HUGEINT" in t or "INT128" in t:
        return "int128"  # always fatal: pandas int128 != spark int64
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    m = re.match(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", t)
    if m:
        return f"decimal({m.group(1)})"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "binary"
    if t.startswith(("STRUCT", "MAP")) or t.endswith("[]") or "LIST" in t:
        return "nested"
    return f"other:{t}"


def spark_hash_class(dt) -> str:
    """Coarse hash class for a pyspark.sql.types.DataType."""
    from pyspark.sql import types as T

    if isinstance(
        dt,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    return f"other:{dt.simpleString()}"


def diff_key(spark_schema, duck_cols, duck_types) -> list[str]:
    """Violations for one query: fatal classes + per-column class skew.

    Column order is driver-irrelevant (it sorts by name), so compare by
    lower-cased name.
    """
    out = []
    smap = {f.name.lower(): spark_hash_class(f.dataType) for f in spark_schema}
    dmap = {
        c.lower(): duck_hash_class(t) for c, t in zip(duck_cols, duck_types)
    }
    for col in sorted(set(smap) | set(dmap)):
        sc, dc = smap.get(col), dmap.get(col)
        if sc is None or dc is None:
            out.append(f"{col}: missing on one side (spark={sc} duck={dc})")
            continue
        if "int128" in (sc, dc):
            out.append(f"{col}: int128 (spark={sc} duck={dc}) — CAST AS BIGINT")
            continue
        if "nested" in (sc, dc):
            out.append(
                f"{col}: nested type (spark={sc} duck={dc}) — emit a scalar"
            )
            continue
        if sc != dc:
            out.append(f"{col}: class skew spark={sc} duck={dc}")
    return out


# ---------------------------------------------------------------- runner


def run(sf_dir: str) -> dict[str, list[str]]:
    """Build every oracled query's Spark plan (lazily — no job run unless
    the query's *construction* collects) and DuckDB logical plan, return
    {name: [violations]} for offending keys only."""
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("oracle-preflight")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad: dict[str, list[str]] = {}
    for name in sorted(oracles):
        try:
            sdf = queries[name](spark, sf_dir)
            rel = con.sql(oracles[name])
            v = diff_key(sdf.schema, rel.columns, rel.types)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            v = [f"error: {e}"[:300]]
        if v:
            bad[name] = v
    return bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = run(sf)
    print(json.dumps({"sf_dir": sf, "violations": bad}, indent=2))
    sys.exit(1 if bad else 0)
