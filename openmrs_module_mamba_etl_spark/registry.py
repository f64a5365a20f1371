"""Query + oracle registry behind ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
ANSI/DuckDB SQL that computes the same result on the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS gate).

Registration happens at import of the inventory modules; ``load_all()`` is
idempotent.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


_loaded = False


def driver_signals() -> dict[str, str]:
    """key → latest driver signal label from CORRECTNESS_r*.json:
    ``'green rN'`` | ``'rows-only rN'`` | ``'red rN'`` | ``'sampled rN'``.

    One state machine for every consumer (rotation ordering below, the
    docs/OPERATORS.md generator): files iterate in round order and the
    last SIGNAL per key wins, where a clean rows-only run (``err:
    no_oracle``, no hash verdict) clears an earlier red but never demotes
    an earlier green.  ``red`` requires an EXPLICIT failure signal —
    ``hash_match: false`` or a non-benign ``err`` — a record that merely
    lacks both (a skipped/timeout-budget shape a future driver might emit)
    reads ``sampled``: it keeps the key OUT of the crashed set and the
    red display class. (An oracled key whose latest signal is ``sampled``
    still sorts into the re-sample-first tier below — desired, a sample
    with no verdict should retry soon; the label only prevents it being
    REPORTED as a failure.)  Unreadable files are skipped.
    """
    sig: dict[str, str] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def round_num(path: str) -> int:
        # Parse the round number so r100 sorts AFTER r99 — a lexicographic
        # filename sort would misorder them and let a stale verdict win.
        stem = os.path.splitext(os.path.basename(path))[0]
        try:
            return int(stem.rsplit("_r", 1)[-1])
        except ValueError:
            return -1

    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
                   key=round_num)
    for path in paths:
        rn = round_num(path)
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            hm = row.get("hash_match")
            err = row.get("err")
            if hm is None and err == "no_oracle":
                # benign rows-only sample: marks sampled, recovers a red
                if not sig.get(key, "").startswith("green"):
                    sig[key] = f"rows-only r{rn}"
            elif hm is True:
                sig[key] = f"green r{rn}"
            elif hm is False or (err is not None and err != ""):
                sig[key] = f"red r{rn}"
            else:
                # hash_match null, no err: unrecognized-but-not-failing shape
                # (e.g. a skipped / budget-cut entry).  Sampled, unclassified —
                # never demotes a green, never counts as crashed.
                if not sig.get(key, "").startswith("green"):
                    sig[key] = f"sampled r{rn}"
    return sig


def _signal_round(label: str) -> int:
    """Round number embedded in a driver-signal label ('green r3' → 3)."""
    try:
        return int(label.rsplit("r", 1)[-1])
    except (ValueError, IndexError):
        return -1


def _driver_history(
    sig: dict[str, str] | None = None,
) -> tuple[set[str], set[str], set[str]]:
    """(verified, sampled, crashed) key sets from CORRECTNESS_r*.json.

    Used only to *order* registration: a time-budgeted external checker walks
    QUERIES in dict order.  ``verified`` = keys whose LATEST driver signal
    (highest round that sampled them) is value-hash green — an earlier green
    does not excuse a later red, so a regressed key re-samples first, not
    last.  ``sampled`` = keys that appeared in any round at all.  ``crashed``
    = keys whose LATEST signal is a hard failure other than the benign
    ``err: no_oracle`` rows-only marker — these must re-sample first even if
    they have no oracle (a crashed rows-only key is a red, not a tier-3
    skip).  Rows-only runs count as sampled but NOT verified — many of those
    keys have since gained oracles or fixes and need a fresh sample.
    Failure to read the files degrades to the neutral (alphabetical) order.
    ``sig`` lets callers that already hold a ``driver_signals()`` dict
    (load_all reads the CORRECTNESS files exactly once) pass it in.
    """
    sig = driver_signals() if sig is None else sig
    sampled = set(sig)
    verified = {k for k, v in sig.items() if v.startswith("green")}
    crashed = {k for k, v in sig.items() if v.startswith("red")}
    return verified, sampled, crashed


def rotation_tiers(sig: dict[str, str] | None = None) -> dict[str, int]:
    """key → rotation tier for every registered key, the single source of
    truth shared by :func:`load_all`'s ordering and the docs/OPERATORS.md
    generator (so the doc can never disagree with the rotation it
    documents): **0** = re-sample first (latest signal red, or sampled
    without a green verdict while the key HAS an oracle — a stale failure
    / unexercised oracle is worse than no signal); **1** = never sampled;
    **2** = certified (hash-green, or clean rows-only-by-design), which
    drains oldest-signal-first."""
    sig = driver_signals() if sig is None else sig
    verified, sampled, crashed = _driver_history(sig)
    tiers: dict[str, int] = {}
    for k in QUERIES:
        if k in verified:
            tiers[k] = 2
        elif k not in sampled:
            tiers[k] = 1
        else:
            # sampled, not green: red / newly-oracled keys re-sample first;
            # CLEAN rows-only-by-design keys rotate with the certified tier.
            tiers[k] = 0 if (k in ORACLE or k in crashed) else 2
    return tiers


def _signal_rounds(sig: dict[str, str] | None = None) -> dict[str, int]:
    """key → round of its latest driver signal of ANY label — the
    staleness metric for the certified tier, where clean
    rows-only-by-design keys rotate alongside hash-greens (their
    rows-only signal ages exactly like a green one does)."""
    sig = driver_signals() if sig is None else sig
    return {k: _signal_round(v) for k, v in sig.items()}


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    from openmrs_module_mamba_etl_spark.inventory import (  # noqa: F401
        aggregates,
        relational,
        tpch_queries,
        tpch_queries2,
        sql_queries,
        scalars,
        sampling_queries,
        flatten_queries,
        llm_queries,
        mining_queries,
        analytics_queries,
        report_queries,
        sink_queries,
        window_queries,
    )

    # Deterministic per-round rotation, three tiers: (0) keys whose last
    # driver signal is red, or was rows-only but have SINCE gained an
    # oracle — a stale failure / unexercised oracle is worse than no
    # signal, so they re-sample first; (1) keys the driver has never
    # sampled; (2) the certified tier — hash-green keys AND clean
    # rows-only-by-design keys together, staleness-ordered (oldest signal
    # first). Rows-only keys originally deferred to a dead-last tier
    # (round-5 verdict task 5: they were displacing never-sampled oracled
    # keys) — but tier 1 already outranks tier 2, so once the
    # never-sampled frontier emptied, permanent deferral only meant their
    # signals aged forever (observed: 7 keys pinned at r5 while every
    # green rotated on a ~6-round cycle; round-10 verdict task 1 demands
    # no signal older than one tier per round). Rotating them by signal
    # age costs ≤7 of 50 slots per cycle and re-proves the rows/schema
    # contract their ``*_portable`` twins can't witness.
    sig = driver_signals()  # parse the CORRECTNESS files exactly once
    tiers = rotation_tiers(sig)

    def tier(k: str) -> int:
        return tiers[k]

    # Within the never-sampled tier, round-robin across name-prefix families
    # (sql_*, stream_*, tpch_*, window_*, ...) instead of pure alphabetical:
    # the unsampled families all start with s/t/w, so a time-budgeted driver
    # walking dict order would exhaust its slots on sql_*/stream_* and leave
    # window_* (the §2.E proof gap) unsampled for another round.  Interleaved,
    # a partial walk still covers every family proportionally.
    fam_pos: dict[str, int] = {}
    rank: dict[str, int] = {}
    for k in sorted(QUERIES):
        fam = k.split("_", 1)[0]
        rank[k] = fam_pos.get(fam, 0)
        fam_pos[fam] = rank[k] + 1

    # Within the certified tier, oldest signal first: a key last certified
    # in round 1 has five rounds of code churn between its proof and today,
    # so the rotation's leftover slots re-certify the stalest signal instead
    # of re-sampling whatever sorts alphabetically (round-6 verdict task 2 —
    # r1/r2-era relational greens had never been re-checked by the driver).
    signal_round = _signal_rounds(sig)

    def sort_key(k: str):
        t = tier(k)
        if t == 1:
            return (t, rank[k], k)
        if t == 2:
            return (t, signal_round.get(k, -1), k)
        return (t, 0, k)

    ordered = sorted(QUERIES, key=sort_key)
    reordered = {k: QUERIES[k] for k in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)

    _loaded = True
