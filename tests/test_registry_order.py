"""Registry registration-order contract: unverified-first rotation."""

from __future__ import annotations

import json

import __spark_entry__ as entrymod

from openmrs_module_mamba_etl_spark import registry


def test_tier_order_matches_correctness_history():
    keys = list(entrymod.queries())
    verified, sampled = registry._driver_history()

    def tier(k: str) -> int:
        if k in verified:
            return 2
        return 0 if k in sampled else 1

    tiers = [tier(k) for k in keys]
    assert tiers == sorted(tiers), "tiers must be monotonically nondecreasing"
    # alphabetical within each tier (neutral order, no cherry-picking)
    for t in (0, 1, 2):
        group = [k for k in keys if tier(k) == t]
        assert group == sorted(group)


def test_history_reader_tolerates_missing_and_garbage(tmp_path, monkeypatch):
    # a fresh clone has no CORRECTNESS files -> empty sets (neutral order)
    import openmrs_module_mamba_etl_spark.registry as regmod

    monkeypatch.setattr(
        regmod.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    v, s = regmod._driver_history()
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
    v, s = regmod._driver_history()
    assert v == {"good"}
    assert s == {"good", "ran_red", "rows_only"}


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
    v, s = regmod._driver_history()
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
    v, s = regmod._driver_history()
    assert v == {"steady"}
    assert s == {"steady"}
