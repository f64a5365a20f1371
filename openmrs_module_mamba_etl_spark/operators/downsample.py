"""Largest-Triangle-Three-Buckets timeseries downsampling (Steinarsson,
"Downsampling Time Series for Visual Representation", 2013).

LTTB keeps the n_out points that preserve a series' visual shape: first and
last point always survive; the interior splits into n_out-2 equal buckets
and each bucket contributes the point forming the largest triangle with the
PREVIOUSLY SELECTED point and the NEXT bucket's average — a sequential
dependency, so the selection is a per-series loop, not a window expression.

Spark shape: the daily rollup contracts the event stream to #types×#days
rows FIRST (map-side-combinable hash aggregate); the LTTB loop then runs as
an ``applyInPandas`` kernel per series — each group is a contracted daily
series (30 rows here, thousands at worst), never raw events. This is the
grouped-pandas seam used exactly where Spark's declarative operators
genuinely cannot express the semantics (recursive selection), per the
engine's UDF policy.

Determinism contract (what lets a SQL oracle replay the loop): x values are
integer epoch-days, y values integer CENTS of the rounded daily total —
bucket means divide once (sum_int / (k·scale)), triangle areas use one
fixed operand order, and ties break to the earliest day. Every float op is
then bit-identical between this kernel and the unrolled DuckDB CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lttb_indices(xs: list[int], cents: list[int], n_out: int) -> list[int]:
    """Selected row indices for one series (sorted by x ascending)."""
    m = len(xs)
    if m <= n_out:
        return list(range(m))
    n_b = n_out - 2
    n_interior = m - 2
    buckets: list[list[int]] = [[] for _ in range(n_b)]
    for j in range(n_interior):
        buckets[j * n_b // n_interior].append(j + 1)
    ys = [c / 100.0 for c in cents]
    sel = [0]
    for i in range(n_b):
        ax = xs[sel[-1]]
        ay = ys[sel[-1]]
        if i < n_b - 1:
            nxt = buckets[i + 1]
            cx = sum(xs[t] for t in nxt) / (1.0 * len(nxt))
            cy = sum(cents[t] for t in nxt) / (100.0 * len(nxt))
        else:
            cx = xs[m - 1]
            cy = ys[m - 1]
        best, best_area = None, -1.0
        for t in buckets[i]:
            area = abs(
                (ax - cx) * (ys[t] - ay) - (ax - xs[t]) * (cy - ay)
            )
            if area > best_area:
                best, best_area = t, area
        sel.append(best)
    sel.append(m - 1)
    return sel


def lttb_downsample(
    daily: DataFrame,
    series_col: str,
    x_col: str,
    cents_col: str,
    n_out: int = 12,
) -> DataFrame:
    """Downsample each series of a contracted (series, x, cents) table to
    ``n_out`` shape-preserving points. Output: (series, x, total=cents/100,
    sel_idx)."""
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        idx = lttb_indices(
            [int(v) for v in pdf[x_col]],
            [int(v) for v in pdf[cents_col]],
            n_out,
        )
        out = pdf.iloc[idx].reset_index(drop=True)
        out["sel_idx"] = range(len(idx))
        out["total"] = [int(c) / 100.0 for c in out[cents_col]]
        return out[[series_col, x_col, "total", "sel_idx"]]

    x_type = daily.schema[x_col].dataType.simpleString()
    s_type = daily.schema[series_col].dataType.simpleString()
    return daily.groupBy(series_col).applyInPandas(
        kernel,
        schema=(
            f"{series_col} {s_type}, {x_col} {x_type}, "
            "total double, sel_idx int"
        ),
    )
