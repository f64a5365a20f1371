"""Regression tests for the round-gate battery tooling (round-12 ADVICE).

Three items landed in round 13:

1. ``streaming/scheduler.py`` had a module-level ``logger`` assignment
   between import blocks (E402) — now below the last import.
2. ``tools/run_round_gates.sh`` rewrote a FAILED bench_ab run to an
   ``info`` status the gate loop treats as pass — broken A/B tooling
   could never fail the battery.  Now ``ab_status_line`` maps run
   failures to ``WARN-ab-run-failed``, which the gate loop fails on.
3. ``tools/bench_ab.sh`` labelled the working-tree arm "HEAD" even when
   the tree was dirty — now ``head_arm_desc`` annotates dirty trees.

The bash tests extract the REAL function/loop text from the scripts and
execute it under bash, so they break if the scripts regress.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bash(script: str, cwd: str | None = None) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["bash", "-c", script], cwd=cwd or REPO, capture_output=True, text=True
    )


def _extract_function(path: str, name: str) -> str:
    """Pull a top-level ``name() { ... }`` block out of a bash script."""
    src = open(os.path.join(REPO, path)).read()
    m = re.search(rf"^{name}\(\) \{{\n(.*?)^\}}$", src, re.S | re.M)
    assert m, f"{name}() not found in {path}"
    return f"{name}() {{\n{m.group(1)}}}\n"


# ---------------------------------------------------------------------------
# 1. scheduler.py import ordering (E402)
# ---------------------------------------------------------------------------


def test_scheduler_no_statements_between_imports():
    import ast

    path = os.path.join(
        REPO, "openmrs_module_mamba_etl_spark", "streaming", "scheduler.py"
    )
    tree = ast.parse(open(path).read())
    body = tree.body
    # Skip the module docstring, then assert every import precedes every
    # non-import statement (no assignment sandwiched between import blocks).
    stmts = [n for n in body if not isinstance(n, ast.Expr)]
    kinds = [isinstance(n, (ast.Import, ast.ImportFrom)) for n in stmts]
    last_import = max(i for i, k in enumerate(kinds) if k)
    first_other = next(i for i, k in enumerate(kinds) if not k)
    assert last_import < first_other, (
        "scheduler.py has a non-import statement between import blocks "
        "(round-12 ADVICE item 1)"
    )


# ---------------------------------------------------------------------------
# 2. run_round_gates.sh: failed bench_ab run must fail the battery
# ---------------------------------------------------------------------------


def test_ab_status_line_ok_is_informational():
    fn = _extract_function("tools/run_round_gates.sh", "ab_status_line")
    r = _bash(fn + 'ab_status_line "ok 512s" "AB_VERDICT: no-code-regression (x)"')
    assert r.returncode == 0
    assert r.stdout.startswith("info [run=ok] AB_VERDICT: no-code-regression")
    assert "512s" in r.stdout


def test_ab_status_line_failed_run_is_warn():
    fn = _extract_function("tools/run_round_gates.sh", "ab_status_line")
    r = _bash(fn + 'ab_status_line "FAIL 512s" ""')
    assert r.returncode == 0
    assert r.stdout.startswith("WARN-ab-run-failed [run=FAIL]")
    assert "no-AB_VERDICT-line" in r.stdout


def test_ab_status_line_head_slower_still_informational():
    # A head-slower VERDICT from a successful run stays informational —
    # the verdict is evidence, not a gate.
    fn = _extract_function("tools/run_round_gates.sh", "ab_status_line")
    r = _bash(fn + 'ab_status_line "ok 600s" "AB_VERDICT: head-slower (y)"')
    assert r.stdout.startswith("info [run=ok] AB_VERDICT: head-slower")


def _extract_gate_loop() -> str:
    src = open(os.path.join(REPO, "tools", "run_round_gates.sh")).read()
    m = re.search(r"^fail=0\n.*?^exit \$fail$", src, re.S | re.M)
    assert m, "gate loop not found in run_round_gates.sh"
    return m.group(0)


@pytest.mark.parametrize(
    "status,expect_fail",
    [
        ("ok 10s", 0),
        ("info [run=ok] AB_VERDICT: no-code-regression 500s", 0),
        ("busy-arm (informational, canaries=0.5/0.3) 9.4", 0),
        ("WARN-ab-run-failed [run=FAIL] no-AB_VERDICT-line 560s", 1),
        ("FAIL 10s", 1),
    ],
)
def test_gate_loop_classification(tmp_path, status, expect_fail):
    """Run the battery's REAL final gate loop against a fabricated LOGDIR."""
    (tmp_path / "bench_ab.status").write_text(status + "\n")
    (tmp_path / "pytest_full.status").write_text("ok 100s\n")
    (tmp_path / "bench.log").write_text("")  # grep'd by the loop tail
    loop = _extract_gate_loop()
    r = _bash(f'LOGDIR="{tmp_path}"\n{loop}')
    assert r.returncode == expect_fail, r.stdout + r.stderr


# ---------------------------------------------------------------------------
# 3. bench_ab.sh: dirty working tree must be annotated, not labelled HEAD
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_repo(tmp_path):
    def g(*args):
        subprocess.run(
            ["git", *args], cwd=tmp_path, check=True, capture_output=True
        )

    g("init", "-q")
    g("config", "user.email", "t@example.com")
    g("config", "user.name", "t")
    (tmp_path / "f.txt").write_text("one\n")
    g("add", "f.txt")
    g("commit", "-q", "-m", "init")
    return tmp_path


def test_head_arm_desc_clean_tree(tiny_repo):
    fn = _extract_function("tools/bench_ab.sh", "head_arm_desc")
    r = _bash(fn + "head_arm_desc", cwd=str(tiny_repo))
    assert r.stdout.startswith("HEAD (")
    assert "dirty" not in r.stdout


def test_head_arm_desc_dirty_tree(tiny_repo):
    (tiny_repo / "f.txt").write_text("two\n")  # modify tracked file
    fn = _extract_function("tools/bench_ab.sh", "head_arm_desc")
    r = _bash(fn + "head_arm_desc", cwd=str(tiny_repo))
    assert r.stdout.startswith("WORKING TREE (dirty"), r.stdout


def test_head_arm_desc_untracked_files_do_not_count(tiny_repo):
    # untracked scratch (logs, __pycache__) isn't benched code — only
    # modifications to tracked files should flip the label
    (tiny_repo / "scratch.log").write_text("x\n")
    fn = _extract_function("tools/bench_ab.sh", "head_arm_desc")
    r = _bash(fn + "head_arm_desc", cwd=str(tiny_repo))
    assert r.stdout.startswith("HEAD (")


def test_scripts_parse():
    for p in ("tools/run_round_gates.sh", "tools/bench_ab.sh"):
        r = _bash(f"bash -n {p}")
        assert r.returncode == 0, r.stderr


def _extract_ab_summary_py() -> str:
    """The python heredoc inside bench_ab.sh that prints the per-arm
    spreads, the AB_VERDICT line, and the best-arm per-query JSON."""
    src = open(os.path.join(REPO, "tools", "bench_ab.sh")).read()
    m = re.search(r'^python - "\$RESULTS" <<\'EOF\'\n(.*?)^EOF$', src, re.S | re.M)
    assert m, "summary heredoc not found in bench_ab.sh"
    return m.group(1)


def test_ab_summary_emits_best_arm_queries(tmp_path):
    """Round-13 gap: a busy round whose only band-comparable reading is
    an A/B arm had totals but no watch-query evidence. The summary must
    surface each arm's BEST run's per-query timings, machine-parsable."""
    import json

    results = tmp_path / "results"
    results.write_text(
        "head 9.0 0.5 0.1\ncontrol 8.5 0.4 0.1\n"
        "head 8.2 0.35 0.1\ncontrol 10.0 0.45 0.2\n"
    )
    (tmp_path / "results.run3.head.json").write_text(
        '{"metric":"x","value":8.2,"load_canary_start":0.35,'
        '"load_canary_end":0.1,"queries":{"q1":1.5}}'
    )
    (tmp_path / "results.run2.control.json").write_text(
        # tty junk before the '{' must be tolerated, like the caller does
        'junk{"metric":"x","value":8.5,"load_canary_start":0.4,'
        '"load_canary_end":0.1,"queries":{"q1":1.7}}'
    )
    r = subprocess.run(
        [sys.executable, "-", str(results)],
        input=_extract_ab_summary_py(),
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "AB_VERDICT: no-code-regression" in out
    best_head = json.loads(
        [l for l in out.splitlines() if l.startswith("AB_BEST_HEAD: ")][0]
        .split(": ", 1)[1]
    )
    assert best_head == {
        "wall": 8.2, "canaries": [0.35, 0.1], "queries": {"q1": 1.5}
    }
    best_ctl = json.loads(
        [l for l in out.splitlines() if l.startswith("AB_BEST_CONTROL: ")][0]
        .split(": ", 1)[1]
    )
    assert best_ctl["queries"] == {"q1": 1.7}


def test_ab_summary_tolerates_missing_query_stash(tmp_path):
    # a run whose JSON stash vanished must not crash the verdict
    results = tmp_path / "results"
    results.write_text("head 9.0 0.5 0.1\ncontrol 8.5 0.4 0.1\n")
    r = subprocess.run(
        [sys.executable, "-", str(results)],
        input=_extract_ab_summary_py(),
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "AB_VERDICT" in r.stdout
    assert "AB_BEST_" not in r.stdout
