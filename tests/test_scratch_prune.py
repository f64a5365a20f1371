"""Unit tests for the shared dead-pid directory pruner (no Spark needed)."""

from __future__ import annotations

import os

from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
    prune_dead_pid_dirs,
)


def _mk(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    return d


def test_prunes_dead_keeps_live_and_foreign(tmp_path):
    # pid 1 is init (alive, not ours); a fresh child pid we know is dead
    dead_pid = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead_pid, 0)

    own = _mk(tmp_path, f"run_{os.getpid()}")
    live = _mk(tmp_path, "run_1")
    dead = _mk(tmp_path, f"run_{dead_pid}")
    nonpid = _mk(tmp_path, "run_notanumber")
    other = _mk(tmp_path, "sf_tiny")

    prune_dead_pid_dirs(tmp_path, "run_")

    assert own.is_dir(), "own pid dir must survive"
    assert live.is_dir(), "live pid dir must survive (concurrent suite)"
    assert not dead.is_dir(), "dead pid dir must be pruned"
    assert nonpid.is_dir(), "non-numeric suffix is not ours to touch"
    assert other.is_dir(), "non-matching prefix is not ours to touch"


def test_missing_parent_is_a_noop(tmp_path):
    prune_dead_pid_dirs(tmp_path / "nope", "run_")  # must not raise
