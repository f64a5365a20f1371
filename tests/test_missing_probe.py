"""Missing-probe parity: every ANN/eval query keyed on the vec_id=0 probe
must publish the SAME result as its oracle when the corpus is non-empty
but the probe row is absent.

The oracles all join ``FROM embeddings b, q`` where ``q`` is the probe
CTE — an absent probe empties (or NULLs) the result on DuckDB. Before the
``_query_vec`` found-flag gate, the Spark side silently fell back to a
zero query vector and published a full top-k of degenerate cosines: a
driver hash-red waiting for any testdata generation that renumbers
vec_ids. This sweep pins the gate with the exact parity compare the
driver uses.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_parity import TABLES, _canon_rows, _duck

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()

#: every registered key whose semantics hang off the vec_id=0 probe row
PROBE_KEYS = [
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",  # rows-only: runs-and-empty is the contract
    "ann_topk_ivf_portable",
    "ann_topk_pq_portable",
    "ann_topk_ivfpq_portable",
    "ann_topk_incremental",
    "eval_ndcg",
    "emb_truncation_eval",
]


@pytest.fixture(scope="session")
def no_probe_sf_dir(tmp_path_factory) -> str:
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sf_no_probe")
    for t in TABLES:
        if t == "embeddings":
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE vec_id <> 0)"
                f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    return str(out)


@pytest.mark.parametrize("name", PROBE_KEYS)
def test_missing_probe_matches_oracle(spark, no_probe_sf_dir, name):
    sdf = QUERIES[name](spark, no_probe_sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLE:
        assert srows == [], f"{name}: rows-only probe query must go empty"
        return

    con = _duck(no_probe_sf_dir)
    rel = con.sql(ORACLE[name])
    ocols = [c.lower() for c in rel.columns]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    assert _canon_rows(scols, srows) == _canon_rows(ocols, orows)
