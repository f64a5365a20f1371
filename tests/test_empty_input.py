"""Empty-increment robustness: every registered query must RUN on a
zero-row star schema.

A day with no new data is a normal production event, not an error: the
pipeline's queries must return empty/identity results with stable schemas
instead of crashing. This sweep found (and now guards) six failure
classes: driver-side vector sampling subscripting an empty collect, float()
over NULL scalar aggregates, schema inference over zero-row parquet
writes (no part files / no partition dirs / no streaming sink output),
pivot value discovery yielding zero attribute columns, ANSI divide-by-zero
on degenerate denominators, and a versioned-table version whose data dirs
all pruned away.

Values are NOT asserted here (the oracle suite owns values); the contract
is "runs and returns its columns".
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

#: keys whose semantics legitimately require data are exempted here —
#: currently none; add with justification only.
EXEMPT: set[str] = set()


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    from openmrs_module_mamba_etl_spark.sources.parquet import TABLES, table

    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - EXEMPT))
def test_runs_on_empty_corpus(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    assert df.columns, f"{name}: no output columns on empty input"
    df.collect()  # must not raise
