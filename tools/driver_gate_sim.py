#!/usr/bin/env python
"""Simulate the round driver's correctness gate before the driver runs it.

The driver imports ``__spark_entry__`` into its OWN plain SparkSession (none
of the repo's session defaults), executes the first N rotation keys at
sf0.01, runs each oracle on DuckDB, and compares row count, column names,
and order-insensitive canonicalized values. The local parity suite mirrors
that compare but runs under the repo's configured session — this script
closes the remaining gap by using a driver-like session, so driver-
environment hazards (missing session conf, cwd-relative paths, streaming
checkpoint dirs) surface HERE instead of in CORRECTNESS_r{N}.json.

Run: ``python tools/driver_gate_sim.py [N] [sf_dir]`` (defaults: 50,
/root/testdata/sf0.01). Prints one JSON line per key and a summary; exit
code 1 if any key fails.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


# -- canonicalization: replicates the driver's hash-compare semantics -------
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
    return sorted("|".join(_canon_val(r[i]) for i in order) for r in rows)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    # Driver-like session: plain builder, only master + a modest shuffle
    # width — NOT openmrs_module_mamba_etl_spark.session.get_spark().
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-gate-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    keys = list(queries)[:n]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from tools import oracle_preflight as preflight

    fails: list[str] = []
    for name in keys:
        t0 = time.monotonic()
        rec: dict = {"key": name}
        try:
            sdf = queries[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["status"] = "rows_only"
            else:
                rel = con.sql(oracles[name])
                ocols = [c.lower() for c in rel.columns]
                skew = preflight.diff_key(sdf.schema, rel.columns, rel.types)
                orows = rel.fetchall()
                if skew:
                    rec["status"] = "FAIL"
                    rec["err"] = f"dtype skew {skew}"
                elif sorted(scols) != sorted(ocols):
                    rec["status"] = "FAIL"
                    rec["err"] = f"cols spark={scols} oracle={ocols}"
                elif len(srows) != len(orows):
                    rec["status"] = "FAIL"
                    rec["err"] = f"rows spark={len(srows)} oracle={len(orows)}"
                elif _canon_rows(scols, srows) != _canon_rows(ocols, orows):
                    a, b = _canon_rows(scols, srows), _canon_rows(ocols, orows)
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                    rec["status"] = "FAIL"
                    rec["err"] = f"values {diff}"
                else:
                    rec["status"] = "ok"
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            rec["status"] = "FAIL"
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.monotonic() - t0, 2)
        if rec["status"] == "FAIL":
            fails.append(name)
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "summary": {
                    "checked": len(keys),
                    "ok": sum(1 for k in keys if k not in fails),
                    "fails": fails,
                    "sf_dir": sf_dir,
                }
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
