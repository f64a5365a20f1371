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


def test_recycled_pid_dir_pruned_after_24h_idle(tmp_path):
    # a live non-Python process models a recycled pid keeping a dead
    # run's dir alive (pid 1 is NOT safe for this: container entrypoints
    # are often python, which would flip _pid_runs_python(1) to True).
    # Idle >24h → pruned anyway; a recently-touched dir with a live pid
    # survives (could be a real run).
    import subprocess

    sleeper = subprocess.Popen(["sleep", "300"])
    try:
        old = _mk(tmp_path, f"run_{sleeper.pid}")
        day_ago = os.stat(old).st_mtime - 25 * 3600
        os.utime(old, (day_ago, day_ago))
        live_pid = os.getppid() if os.getppid() not in (0, 1) else os.getpid()
        fresh_pid_dir = _mk(tmp_path, f"run_{live_pid}")

        prune_dead_pid_dirs(tmp_path, "run_")

        assert not old.is_dir(), "24h-idle dir with live (recycled) pid pruned"
        assert fresh_pid_dir.is_dir(), "fresh dir with live pid survives"
    finally:
        sleeper.kill()
        sleeper.wait()


def test_live_root_marker_exempts_external_root(tmp_path, monkeypatch):
    # A MAMBA_SCRATCH_DIR root placed INSIDE _scratch gets a marker that
    # exempts it from the legacy idle sweep, no matter how stale its mtime.
    import openmrs_module_mamba_etl_spark.inventory.sink_queries as sq

    monkeypatch.setattr(sq, "_SCRATCH_BASE", tmp_path)
    monkeypatch.setattr(sq, "_SCRATCH", None)
    monkeypatch.setenv("MAMBA_SCRATCH_DIR", str(tmp_path / "external_root"))
    ext = sq._scratch_root()
    assert (ext / ".mamba_live_root").exists()

    # age the root far past the 1h idle cutoff
    old = ext.stat().st_mtime - 48 * 3600
    os.utime(ext, (old, old))

    # a second process resolving the default root runs the legacy sweep
    monkeypatch.delenv("MAMBA_SCRATCH_DIR")
    monkeypatch.setattr(sq, "_SCRATCH", None)
    stale_legacy = _mk(tmp_path, "old_fixed_dir")
    os.utime(stale_legacy, (old, old))
    sq._scratch_root()
    try:
        assert ext.is_dir(), "marked external root must survive the sweep"
        assert not stale_legacy.is_dir(), "unmarked stale legacy dir reaped"
    finally:
        monkeypatch.setattr(sq, "_SCRATCH", None)


def test_dead_owner_marker_stops_protecting(tmp_path, monkeypatch):
    # a crashed run's external root (marker pid dead) must fall back to
    # the age guard instead of living forever
    import openmrs_module_mamba_etl_spark.inventory.sink_queries as sq

    monkeypatch.setattr(sq, "_SCRATCH_BASE", tmp_path)
    monkeypatch.setattr(sq, "_SCRATCH", None)

    dead_pid = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead_pid, 0)
    orphan = _mk(tmp_path, "crashed_ci_root")
    (orphan / ".mamba_live_root").write_text(str(dead_pid))
    old = orphan.stat().st_mtime - 48 * 3600
    os.utime(orphan, (old, old))

    try:
        sq._scratch_root()  # default-root resolution runs the sweep
        assert not orphan.is_dir(), "dead-owner external root must be reaped"
    finally:
        monkeypatch.setattr(sq, "_SCRATCH", None)


def test_marker_append_preserves_other_owners(tmp_path):
    # two processes sharing one MAMBA_SCRATCH_DIR must BOTH end up in the
    # marker — the round-7 single-pid format lost the survivor's
    # protection as soon as the marker-owning process exited first
    import signal

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _live_root_owner_alive,
        _marker_add_pid,
    )

    marker = tmp_path / ".mamba_live_root"
    # a LIVE python co-owner (a plain `sleep` would read as a recycled
    # pid to the liveness filter — correctly, since mamba suites are
    # always python processes)
    sleeper = os.spawnlp(
        os.P_NOWAIT, "python3", "python3", "-c", "import time; time.sleep(60)"
    )
    try:
        _marker_add_pid(marker, sleeper)        # first owner (alive)
        _marker_add_pid(marker, os.getpid())    # second owner (us, alive)
        _marker_add_pid(marker, os.getpid())    # re-resolution: no dup line
        assert marker.read_text().split() == [str(sleeper), str(os.getpid())]
        assert _live_root_owner_alive(marker)
    finally:
        os.kill(sleeper, signal.SIGKILL)
        os.waitpid(sleeper, 0)

    # first owner gone, second alive: root still protected
    assert _live_root_owner_alive(marker)

    # all owners gone: protection drops, age sweep applies
    dead2 = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead2, 0)
    marker.write_text(f"{sleeper}\n{dead2}\n")
    assert not _live_root_owner_alive(marker)

    # garbled/legacy content keeps protecting (never reap unattributable)
    marker.write_text("not-a-pid\n")
    assert _live_root_owner_alive(marker)


def test_marker_append_compacts_dead_and_recycled_pids(tmp_path):
    # round-8 ADVICE item 1: a long-lived shared root must not accumulate
    # dead-pid lines forever, and a RECYCLED pid (alive but not a
    # python/java process) must neither survive compaction nor keep the
    # root protected
    import signal

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _live_root_owner_alive,
        _marker_add_pid,
    )

    marker = tmp_path / ".mamba_live_root"
    dead = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead, 0)
    # stands in for an unrelated process that re-used a dead owner's pid
    recycled = os.spawnlp(os.P_NOWAIT, "sleep", "sleep", "60")
    try:
        # wait out the fork→exec transition: until exec completes the
        # child's /proc cmdline still shows the forked python image
        import time

        for _ in range(200):
            with open(f"/proc/{recycled}/cmdline", "rb") as fh:
                if fh.read().startswith(b"sleep"):
                    break
            time.sleep(0.01)
        marker.write_text(f"{dead}\n{recycled}\n")
        assert not _live_root_owner_alive(marker)

        _marker_add_pid(marker, os.getpid())
        assert marker.read_text().split() == [str(os.getpid())]
        assert _live_root_owner_alive(marker)

        # garbled lines are never compacted away (can't attribute them)
        marker.write_text(f"not-a-pid\n{dead}\n")
        _marker_add_pid(marker, os.getpid())
        assert marker.read_text().split() == ["not-a-pid", str(os.getpid())]
    finally:
        os.kill(recycled, signal.SIGKILL)
        os.waitpid(recycled, 0)

def test_marker_compaction_cannot_drop_concurrent_appender(tmp_path):
    # round-9 ADVICE item 2: the dead-line compaction used to be a
    # read → rewrite-aside → os.replace, so a concurrent owner's append
    # landing between the read and the replace was dropped and that LIVE
    # process lost root protection for its whole lifetime. Appends and
    # compaction now serialize under an exclusive flock on the marker
    # inode (in-place truncate+rewrite, never a replace): N concurrent
    # adders — each also triggering the compaction path via a pre-seeded
    # dead line — must ALL survive in the final marker.
    import signal
    import threading

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _marker_add_pid,
    )

    marker = tmp_path / ".mamba_live_root"
    sleepers = [
        os.spawnlp(
            os.P_NOWAIT,
            "python3", "python3", "-c", "import time; time.sleep(120)",
        )
        for _ in range(8)
    ]
    dead = os.spawnlp(os.P_NOWAIT, "true", "true")
    os.waitpid(dead, 0)
    try:
        # every adder sees at least one provably-dead line, so every call
        # takes the compaction (truncate+rewrite) branch, not the append
        marker.write_text(f"{dead}\n")

        errs: list[BaseException] = []

        def add(pid: int) -> None:
            try:
                _marker_add_pid(marker, pid)
            except BaseException as e:  # noqa: BLE001 — surfaced below
                errs.append(e)

        threads = [
            threading.Thread(target=add, args=(pid,)) for pid in sleepers
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        final = marker.read_text().split()
        # no live owner dropped, the dead seed compacted away, no dups
        assert sorted(final) == sorted(str(p) for p in set(sleepers))
        assert str(dead) not in final
    finally:
        for pid in sleepers:
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)


def test_marker_survives_lockless_filesystem(monkeypatch, tmp_path):
    """Round-10 review: on a filesystem without flock support (ENOLCK —
    NFS with no lock daemon), appends must degrade to the plain O_APPEND
    one-liner instead of crashing startup, and reads must keep the root
    PROTECTED instead of misreading the lock failure as 'no marker'."""
    import errno
    import fcntl
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _live_root_owner_alive,
        _marker_add_pid,
    )

    def no_flock(*_a, **_k):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", no_flock)

    marker = tmp_path / ".mamba_live_root"
    # pre-existing lines from another owner — one live, one provably dead
    marker.write_text("1\n999999999\n")
    _marker_add_pid(marker, os.getpid())  # must not raise
    _marker_add_pid(marker, os.getpid())  # append-only fallback: dup OK
    tokens = marker.read_text().split()
    assert str(os.getpid()) in tokens
    # no marker loss: the other owner's live line survives the fallback,
    # and even the DEAD line survives — compaction is a locked
    # truncate+rewrite, so without the lock it must be skipped entirely
    # (an unserialized truncate could tear a concurrent owner's append)
    assert "1" in tokens and "999999999" in tokens
    # live own pid recorded => protected, even though flock fails
    assert _live_root_owner_alive(marker) is True
    # and a genuinely missing marker still reads as 'not an external root'
    assert _live_root_owner_alive(tmp_path / "absent") is False


def test_unopenable_marker_keeps_protecting(monkeypatch, tmp_path):
    """Round-10 ADVICE item 1: an open() failure on an EXISTING marker
    (EACCES on another user's umask-077 marker on a shared scratch root,
    EIO) means the root is unattributable, not absent — only ENOENT may
    read as 'not an external root'."""
    import builtins
    import errno

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _live_root_owner_alive,
    )

    marker = tmp_path / ".mamba_live_root"
    marker.write_text("999999999\n")  # dead owner — would reap if readable

    real_open = builtins.open

    def eacces_open(path, *a, **k):
        if str(path) == str(marker):
            raise PermissionError(errno.EACCES, "Permission denied", str(path))
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", eacces_open)
    assert _live_root_owner_alive(marker) is True, (
        "unopenable existing marker must keep the root protected"
    )
    monkeypatch.undo()
    # sanity: the same marker, readable, attributes to a dead pid => reap
    assert _live_root_owner_alive(marker) is False


def test_marker_unconditional_rewrite_under_lock(tmp_path):
    """The locked path always compacts: dead pids vanish on the next add
    even when nothing else changed."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _marker_add_pid,
    )

    marker = tmp_path / ".mamba_live_root"
    marker.write_text("999999999\n")  # provably-dead (pid > pid_max)
    _marker_add_pid(marker, os.getpid())
    assert marker.read_text().split() == [str(os.getpid())]
