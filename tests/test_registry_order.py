"""Registry registration-order contract: unverified-first rotation."""

from __future__ import annotations

import json

import __spark_entry__ as entrymod

from openmrs_module_mamba_etl_spark import registry


def test_tier_order_matches_correctness_history():
    keys = list(entrymod.queries())
    verified, sampled, crashed = registry._driver_history()

    def tier(k: str) -> int:
        if k in verified:
            return 2
        if k not in sampled:
            return 1
        # clean rows-only-by-design keys rotate inside the certified tier
        return 0 if (k in registry.ORACLE or k in crashed) else 2

    tiers = [tier(k) for k in keys]
    assert tiers == sorted(tiers), "tiers must be monotonically nondecreasing"
    # alphabetical within tier 0 (neutral order, no cherry-picking)
    group = [k for k in keys if tier(k) == 0]
    assert group == sorted(group)
    # tier 2 (greens + clean rows-only) is staleness-ordered: oldest driver
    # signal first, so leftover rotation slots re-certify the signal that
    # has aged the most; alphabetical tie-break within a round.
    signal_round = registry._signal_rounds()
    g2 = [k for k in keys if tier(k) == 2]
    assert g2 == sorted(g2, key=lambda k: (signal_round.get(k, -1), k))
    # tier 1 (never-sampled) interleaves name-prefix families round-robin so
    # a slot-budgeted driver walk covers every family proportionally: keys
    # are ordered by (position within own family, name) — and within any one
    # family that still yields alphabetical order.
    t1 = [k for k in keys if tier(k) == 1]
    fam_pos: dict[str, int] = {}
    rank = {}
    for k in sorted(keys):  # rank within family over ALL keys, like registry
        fam = k.split("_", 1)[0]
        rank[k] = fam_pos.get(fam, 0)
        fam_pos[fam] = rank[k] + 1
    assert t1 == sorted(t1, key=lambda k: (rank[k], k))
    fams = {k.split("_", 1)[0] for k in t1}
    for fam in fams:
        group = [k for k in t1 if k.split("_", 1)[0] == fam]
        assert group == sorted(group)
    # The interleave property itself is pinned on fixed data below
    # (test_family_interleave_comparator_on_synthetic_keys) — a live-data
    # "t1 != sorted(t1)" assertion would flake once the never-sampled
    # frontier shrinks to ≤1 key per family, where the round-robin
    # degenerates to alphabetical by construction.


def test_family_interleave_comparator_on_synthetic_keys():
    """Pin the round-robin interleave on fixed data, independent of how
    much of the live registry the driver has already sampled."""
    keys = ["sql_a", "sql_b", "stream_a", "stream_b", "window_a"]
    fam_pos: dict[str, int] = {}
    rank: dict[str, int] = {}
    for k in sorted(keys):
        fam = k.split("_", 1)[0]
        rank[k] = fam_pos.get(fam, 0)
        fam_pos[fam] = rank[k] + 1
    ordered = sorted(keys, key=lambda k: (rank[k], k))
    # one key per family first (alphabetical within the wave), then wave 2
    assert ordered == ["sql_a", "stream_a", "window_a", "sql_b", "stream_b"]


def test_history_reader_tolerates_missing_and_garbage(tmp_path, monkeypatch):
    # a fresh clone has no CORRECTNESS files -> empty sets (neutral order)
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    v, s, c = regmod._driver_history()
    assert v == set() and s == set()

    # garbage file is skipped, valid rows still read
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "good": {"hash_match": True},
                "ran_red": {"hash_match": False, "err": "boom"},
                "rows_only": {"hash_match": None, "err": "no_oracle"},
            }
        )
    )
    v, s, c = regmod._driver_history()
    assert v == {"good"}
    assert s == {"good", "ran_red", "rows_only"}
    # only the hard failure is crashed; a clean rows-only run is benign
    assert c == {"ran_red"}


def test_history_latest_signal_wins(tmp_path, monkeypatch):
    # a key green in r01 but red in r02 must NOT count as verified —
    # the latest driver signal governs, so regressions re-sample first
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "regressed": {"hash_match": True},
                "recovered": {"hash_match": False, "err": "boom"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "regressed": {"hash_match": False, "err": "boom"},
                "recovered": {"hash_match": True},
            }
        )
    )
    v, s, c = regmod._driver_history()
    assert v == {"recovered"}
    assert s == {"regressed", "recovered"}


def test_history_rows_only_does_not_demote(tmp_path, monkeypatch):
    # a later rows-only sample (err: no_oracle, no hash verdict) is not a
    # contrary signal — an earlier green must survive it
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"steady": {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {"steady": {"hash_match": None, "err": "no_oracle", "spark_rows": 5}}
        )
    )
    v, s, c = regmod._driver_history()
    assert v == {"steady"}
    assert s == {"steady"}


def test_history_crashed_rows_only_key_flags_crashed(tmp_path, monkeypatch):
    # a rows-only key (no oracle) that RAISED is a red, not a benign
    # rows-only pass — it must appear in crashed so the rotation puts it
    # in tier 0 (re-sample first) instead of the certified tier's
    # staleness queue
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "blew_up": {"hash_match": None, "err": "AnalysisException"},
                "fine_rows_only": {"hash_match": None, "err": "no_oracle"},
            }
        )
    )
    v, s, c = regmod._driver_history()
    assert v == set()
    assert s == {"blew_up", "fine_rows_only"}
    assert c == {"blew_up"}


def test_history_unclassified_shape_is_sampled_not_red(tmp_path, monkeypatch):
    # a record with neither a hash verdict nor an err (e.g. a future driver's
    # skipped/budget-cut marker) is sampled-but-unclassified: it must not be
    # labelled red (which would pin the key in tier 0 forever) and must not
    # demote an earlier green
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"was_green": {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "was_green": {"hash_match": None, "spark_rows": 5},
                "new_odd": {"hash_match": None},
                "empty_err": {"hash_match": None, "err": ""},
            }
        )
    )
    sig = regmod.driver_signals()
    assert sig["was_green"] == "green r1"
    assert sig["new_odd"] == "sampled r2"
    assert sig["empty_err"] == "sampled r2"
    v, s, c = regmod._driver_history()
    assert v == {"was_green"}
    assert s == {"was_green", "new_odd", "empty_err"}
    assert c == set()


def test_signal_rounds_staleness_map(tmp_path, monkeypatch):
    # _signal_rounds reports the LATEST signal round per key — green OR
    # clean rows-only — so the rotation re-certifies the stalest signal
    # first regardless of label
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"old": {"hash_match": True}, "refresh": {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({
            "refresh": {"hash_match": True},
            "rowsonly": {"rows_match": True, "err": "no_oracle"},
        })
    )
    assert regmod._signal_rounds() == {"old": 1, "refresh": 3, "rowsonly": 3}


def test_rotation_tiers_matches_ordering_tiering():
    """rotation_tiers() is the shared tier source for load_all() ordering
    AND docs/OPERATORS.md (round-12 review: the doc's staleness histogram
    previously re-derived tiers and binned re-sample-first keys into the
    certified round cohorts). Pin it to the same tier definition the
    ordering test above uses."""
    registry.load_all()
    sig = registry.driver_signals()
    verified, sampled, crashed = registry._driver_history(sig)
    tiers = registry.rotation_tiers(sig)
    assert set(tiers) == set(registry.QUERIES)
    for k, t in tiers.items():
        if k in verified:
            expect = 2
        elif k not in sampled:
            expect = 1
        else:
            expect = 0 if (k in registry.ORACLE or k in crashed) else 2
        assert t == expect, k
    # and the registry dict order is nondecreasing in these tiers
    order = [tiers[k] for k in registry.QUERIES]
    assert order == sorted(order)
