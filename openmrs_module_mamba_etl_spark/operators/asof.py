"""As-of (point-in-time) join — the trades/quotes operator Spark lacks.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key. The naive formulation is a
non-equi join (quadratic blow-up per key) followed by a per-left-row
argmax; the Spark-shaped plan is the UNION + SORT + CARRY-FORWARD idiom:

1. tag both inputs and union them into one (key, ts)-stream;
2. one window sort per key, right rows ordered BEFORE left rows at
   equal timestamps (so "at or before" includes ties);
3. ``last(col, ignorenulls=True)`` over an unbounded-preceding frame
   carries each right row's payload forward to every later left row;
4. keep only left rows.

One sort shuffle total, linear in |L| + |R|, no pair blow-up — the same
merge-scan shape a time-series database uses, expressed declaratively so
Catalyst/AQE still pick partition counts. Skewed keys salt exactly like
any other window (the frame is a prefix scan, so per-key order is all
that matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    right_key_col: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Point-in-time enrich ``left`` with the nearest ``right`` payload.

    ``direction="backward"`` (default) attaches the LATEST right row with
    ``right.ts <= left.ts``; ``"forward"`` the EARLIEST right row with
    ``right.ts >= left.ts`` (the scheduling/next-reading variant). Both
    are the same union + single window sort plan — forward just scans the
    merged stream in descending time order, so the prefix carry picks the
    nearest later row. ``"nearest"`` attaches whichever side is closer in
    absolute distance (ties → backward), still over ONE ascending sort:
    backward is the prefix carry, forward the suffix first — two window
    passes, one exchange.

    ``right`` is first deduplicated to one row per (key, ts) —
    latest-``tiebreak_col`` wins — so the carried payload is deterministic
    even when several right rows share a timestamp. Left rows with no
    right row on the required side keep NULL payloads (left-outer as-of).
    Payload columns are emitted as ``asof_<name>``. ``right_key_col``
    defaults to ``key_col`` when both sides share the name.

    ``tolerance_us`` bounds the match distance (pandas ``merge_asof
    (tolerance=...)`` semantics): a carried right row further than the
    tolerance from the left timestamp reverts to NULL payloads — the
    carry itself is unchanged (still one window pass), only the emit
    filters, so the plan shape is identical. Microseconds for timestamp
    columns; the raw column unit for numeric timestamps.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    rk = right_key_col or key_col
    # Payload columns ride under reserved "_p_" names so a left column that
    # happens to share a payload name is never merged by unionByName (that
    # collision used to silently carry the left row's OWN value forward).
    r = right.select(
        F.col(rk).alias("_k"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    if tiebreak_col is not None:
        w_dedup = Window.partitionBy("_k", "_ts").orderBy(
            F.col(tiebreak_col).desc()
        )
        r = (
            right.select(
                F.col(rk).alias("_k"),
                F.col(right_ts).alias("_ts"),
                F.col(tiebreak_col),
                *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
            )
            .withColumn("_rn", F.row_number().over(w_dedup))
            .where(F.col("_rn") == 1)
            .drop("_rn", tiebreak_col)
        )

    l = left.withColumn("_k", F.col(key_col)).withColumn(
        "_ts", F.col(left_ts).cast(r.schema["_ts"].dataType)
    )
    tagged_r = r.withColumn("_side", F.lit(0))
    tagged_l = l.withColumn("_side", F.lit(1))
    merged = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # Carry the latest right row as ONE struct — all attached payload
    # values (NULLs included) come from the SAME row as the reported
    # asof_ts; per-column last(ignorenulls) could mix rows and resurrect
    # an older non-null value past a newer NULL.
    asof_row = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("__t"),
            *[F.col(f"_p_{c}").alias(f"_p_{c}") for c in payload_cols],
        ),
    )
    is_ts = str(r.schema["_ts"].dataType).startswith("Timestamp")

    def _us(col):
        return F.unix_micros(col) if is_ts else col

    if direction == "nearest":
        # One ascending sort serves BOTH sides: backward = prefix carry,
        # forward = suffix first — same partitioning and ordering, so the
        # plan pays one exchange+sort and two window passes (no second
        # shuffle). Equal-ts right rows sort before the left row and land
        # in the backward carry with distance 0, which the tie rule
        # (<= → backward wins) then always selects — pandas merge_asof
        # "nearest" semantics with a deterministic tiebreak.
        w_asc = Window.partitionBy("_k").orderBy(
            F.col("_ts").asc(), F.col("_side").asc()
        )
        back = F.last(asof_row, ignorenulls=True).over(
            w_asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fwd = F.first(asof_row, ignorenulls=True).over(
            w_asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        lt_us = _us(F.col("_ts"))
        bt, ft = _us(back.getField("__t")), _us(fwd.getField("__t"))
        choose_b = bt.isNotNull() & (
            ft.isNull() | ((lt_us - bt) <= (ft - lt_us))
        )
        carried = merged.withColumn(
            "_asof", F.when(choose_b, back).otherwise(fwd)
        )
    else:
        # right (_side 0) sorts before left (_side 1) at equal ts → ties
        # count ("at or before" / "at or after" include the equal stamp)
        ts_order = (
            F.col("_ts").asc()
            if direction == "backward"
            else F.col("_ts").desc()
        )
        w = (
            Window.partitionBy("_k")
            .orderBy(ts_order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = merged.withColumn(
            "_asof", F.last(asof_row, ignorenulls=True).over(w)
        )

    asof_ts = F.col("_asof").getField("__t")

    def payload(c: str):
        return F.col("_asof").getField(f"_p_{c}")

    if tolerance_us is not None:
        lt, at = _us(F.col("_ts")), _us(asof_ts)
        if direction == "backward":
            delta = lt - at
        elif direction == "forward":
            delta = at - lt
        else:  # nearest: bound the absolute match distance
            delta = F.abs(lt - at)
        valid = asof_ts.isNotNull() & (delta <= F.lit(tolerance_us))
        orig_payload = payload

        def payload(c: str):  # noqa: F811 — tolerance-gated emit
            return F.when(valid, orig_payload(c))

        asof_ts = F.when(valid, asof_ts)

    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[payload(c).alias(f"asof_{c}") for c in payload_cols],
        asof_ts.alias("asof_ts"),
    )
