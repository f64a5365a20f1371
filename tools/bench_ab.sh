#!/usr/bin/env bash
# Same-box bench A/B — the box-vs-diff adjudication protocol, automated.
#
# Two rounds running (r10, r11), every driver bench reading was busy-arm
# (start canary > 0.35) and the old-tree control had to be assembled by
# hand: worktree-checkout the last round's tree, alternate HEAD/control
# benches on THIS box, and compare spreads. One shared band ⇒ box, not
# diff. This script is that protocol as one command (round-11 verdict
# task 3); run_round_gates.sh invokes it automatically when the bench
# leg's start canary exceeds the 0.35 idle gate.
#
# Usage: tools/bench_ab.sh <git-ref> [n_pairs]
#   <git-ref>  control tree (e.g. the previous round's snapshot commit)
#   [n_pairs]  HEAD/control alternations, default 2 (4 bench runs total)
#
# Emits a per-run table (arm, wall seconds, canaries) plus per-arm
# min/max and a verdict line:
#   AB_VERDICT: no-code-regression   HEAD min <= control min * 1.10
#   AB_VERDICT: head-slower          otherwise (investigate the diff)
# Exit 0 in both cases (the verdict is evidence, not a gate); nonzero
# only if a bench run itself fails.
set -u
cd "$(dirname "$0")/.."

REF="${1:?usage: tools/bench_ab.sh <git-ref> [n_pairs]}"
PAIRS="${2:-2}"
WT="/tmp/bench_ab_control_$$"

git rev-parse --verify --quiet "$REF^{commit}" >/dev/null || {
    echo "bench_ab: unknown ref '$REF'" >&2; exit 2; }

cleanup() {
    git worktree remove --force "$WT" >/dev/null 2>&1 || true
    rm -rf "$WT"
}
trap cleanup EXIT
git worktree add --detach "$WT" "$REF" >/dev/null 2>&1 || {
    echo "bench_ab: worktree add failed for $REF" >&2; exit 2; }

# The 'head' arm benches the WORKING TREE (in the battery that is the
# tree about to be committed — the thing we actually want adjudicated),
# which only equals the HEAD commit when the tree is clean. Annotate
# loudly when it isn't, so a dirty-tree A/B can't be read as
# HEAD-vs-control in the ledger (round-12 ADVICE item 3).
head_arm_desc() {
    if [ -n "$(git status --porcelain --untracked-files=no 2>/dev/null)" ]; then
        echo "WORKING TREE (dirty; not commit $(git rev-parse --short HEAD))"
    else
        echo "HEAD ($(git rev-parse --short HEAD))"
    fi
}
HEAD_ARM_DESC="$(head_arm_desc)"
case "$HEAD_ARM_DESC" in "WORKING TREE"*)
    echo "bench_ab: WARNING: working tree has uncommitted changes —" \
         "the 'head' arm benches the working tree, not the HEAD commit" >&2
esac

# one bench run in $1 (tree dir); appends "arm wall start end" to $2
run_one() {
    local dir="$1" arm="$2" out="$3"
    local line vals err
    err=$(mktemp)
    line=$( (cd "$dir" && timeout 560 python bench.py 2>"$err") \
            | grep '"metric"' | tail -1) || true
    if [ -z "$line" ]; then
        echo "bench_ab: bench run failed in $dir ($arm); stderr tail:" >&2
        tail -20 "$err" >&2
        rm -f "$err"
        return 1
    fi
    rm -f "$err"
    # parse via stdin (never splice $line into source: the metric line can
    # carry tty junk before the '{', including shell/Python metachars)
    vals=$(printf '%s' "$line" | python -c '
import json, sys
s = sys.stdin.read()
d = json.loads(s[s.find("{"):])
print(d["value"], d["load_canary_start"], d["load_canary_end"])
') || {
        echo "bench_ab: unparsable metric line from $dir ($arm)" >&2
        return 1
    }
    echo "$arm $vals" >> "$out"
    # stash the full metric JSON per run so the summary can surface the
    # BEST arm's per-query timings — without this, a busy round whose
    # only band-comparable reading comes from the A/B has totals but no
    # watch-query evidence (the round-13 gap)
    printf '%s' "$line" > "$out.run$(wc -l < "$out").$arm.json"
}

RESULTS=$(mktemp)
fail=0
for i in $(seq 1 "$PAIRS"); do
    # alternate so slow drift within the session hits both arms equally
    run_one "$PWD" head    "$RESULTS" || fail=1
    run_one "$WT"  control "$RESULTS" || fail=1
done

echo "== bench A/B: $HEAD_ARM_DESC vs $REF ($PAIRS pairs, alternating) =="
printf '%-8s %-8s %-7s %-7s\n' arm wall start end
awk '{printf "%-8s %-8s %-7s %-7s\n", $1, $2, $3, $4}' "$RESULTS"

python - "$RESULTS" <<'EOF'
import json
import sys

rows = [l.split() for l in open(sys.argv[1]) if l.strip()]
arms = {}
for i, (arm, wall, s, e) in enumerate(rows, start=1):
    arms.setdefault(arm, []).append((float(wall), i))
for arm in ("head", "control"):
    vs = [w for w, _ in arms.get(arm, [])]
    if vs:
        print(f"{arm}: min {min(vs):.3f}  max {max(vs):.3f}  n {len(vs)}")
h = [w for w, _ in arms.get("head", [])]
c = [w for w, _ in arms.get("control", [])]
if h and c:
    if min(h) <= min(c) * 1.10:
        print("AB_VERDICT: no-code-regression "
              f"(HEAD min {min(h):.3f} <= control min {min(c):.3f} * 1.10)")
    else:
        print("AB_VERDICT: head-slower "
              f"(HEAD min {min(h):.3f} > control min {min(c):.3f} * 1.10)")
# per-query timings of each arm's BEST run, machine-parsable: the only
# band-comparable watch-query evidence a busy round may have
for arm in ("head", "control"):
    if not arms.get(arm):
        continue
    wall, idx = min(arms[arm])
    try:
        raw = open(f"{sys.argv[1]}.run{idx}.{arm}.json").read()
        d = json.loads(raw[raw.find("{"):])
    except (OSError, ValueError):
        continue
    print(f"AB_BEST_{arm.upper()}: " + json.dumps({
        "wall": d.get("value"),
        "canaries": [d.get("load_canary_start"), d.get("load_canary_end")],
        "queries": d.get("queries", {}),
    }, sort_keys=True))
EOF
rm -f "$RESULTS" "$RESULTS".run*.json
exit $fail
