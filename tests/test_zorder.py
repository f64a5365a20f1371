"""Z-order layout: content preservation and the multi-dimensional
min/max-skipping property that justifies the operator."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.operators.zorder import zorder_write


def _mean_file_area(spark, path, dims):
    """Mean fraction of the 2-D key space covered per parquet file — the
    probability a file survives min/max pruning for a random point
    predicate on BOTH dimensions. Random layouts score ~1.0."""
    areas = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        aggs = []
        for col, _, _ in dims:
            aggs += [F.min(col).alias(f"lo_{col}"), F.max(col).alias(f"hi_{col}")]
        r = spark.read.parquet(f).agg(*aggs).collect()[0]
        area = 1.0
        for col, lo, hi in dims:
            area *= (r[f"hi_{col}"] - r[f"lo_{col}"]) / (hi - lo)
        areas.append(area)
    return sum(areas) / len(areas)


def test_zorder_preserves_content_and_skips_on_both_dims(spark, sf_dir, tmp_path):
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder_write(src, ["o_custkey", "o_totalprice"], zpath, n_files=16)
    # control: same file count, hash-random layout
    src.repartition(16).write.mode("overwrite").parquet(rpath)

    # content identical
    assert (
        spark.read.parquet(zpath).exceptAll(src).count() == 0
        and src.exceptAll(spark.read.parquet(zpath)).count() == 0
    )

    g = src.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    dims = [("o_custkey", g[0], g[1]), ("o_totalprice", g[2], g[3])]
    z = _mean_file_area(spark, zpath, dims)
    r = _mean_file_area(spark, rpath, dims)
    # a random layout's files each cover ~the whole rectangle; z-order
    # files cover small curve segments — at least 4x less area each
    assert r > 0.8, r
    assert z < 0.25 * r, (z, r)
