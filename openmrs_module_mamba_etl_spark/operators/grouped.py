"""Grouped-map kernels — `applyInPandas` per-group feature extraction.

The third Arrow seam alongside `mapInPandas` (multimodal) and
`applyInPandasWithState` (streaming sessions): the engine groups and
shuffles, the kernel sees one full group as a pandas DataFrame. Use it
when per-entity logic needs whole-group numerics (regression, FFT,
model scoring) that built-in aggregates can't express. Each group must
fit one executor's memory — at 100 TB that's per-entity history, not the
corpus; salt or pre-aggregate entities that don't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("slope_per_day", DoubleType()),
    ]
)

_NS_PER_DAY = 86_400 * 1_000_000_000


def user_trend(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user least-squares slope of value over time (per day).

    Classic OLS cov(x,y)/var(x) on mean-centered days — the same formula
    SQL's REGR_SLOPE defines, computed vectorized per group. Groups with a
    single event (zero time variance) yield NULL.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[ts_col].to_numpy(dtype=np.float64) / _NS_PER_DAY
        y = pdf[value_col].to_numpy(dtype=np.float64)
        xc = x - x.mean()
        den = float((xc * xc).sum())
        slope = float((xc * (y - y.mean())).sum() / den) if den > 0 else None
        return pd.DataFrame(
            {
                "user_id": [int(pdf[key_col].iloc[0])],
                "n_events": [len(pdf)],
                "slope_per_day": [slope],
            }
        )

    return events.groupBy(key_col).applyInPandas(kernel, TREND_SCHEMA)


def weighted_mean_udaf():
    """Vectorized grouped-aggregate UDAF (`pandas_udf` GROUPED_AGG): the
    Arrow path for aggregation logic DataFrame built-ins can't express —
    each group's columns arrive as whole pandas Series, one batch per
    group, ~100x fewer interpreter crossings than a row-at-a-time Python
    UDAF. Weighted mean is deliberately also SQL-expressible
    (sum(w*x)/sum(w)) so the seam itself is oracle-checkable
    (SURVEY §2.H H3: pandas_udf/UDAF only where needed — this pins the
    mechanism, registered queries keep built-ins in the hot path)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def weighted_mean(x: pd.Series, w: pd.Series) -> float:
        sw = float(w.sum())
        return float((x * w).sum() / sw) if sw else 0.0

    return weighted_mean
