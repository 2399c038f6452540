#!/usr/bin/env bash
# MECHANIZED round-close gate: one command that runs the entire
# round-close ritual in the required order and writes the validation
# record itself, so no step can be skipped by forgetting the ritual
# (the failure mode the ritual's checklist form left open — the
# protection was procedural, this makes it a single entry point).
#
#   tools/round_close.sh <round-number>
#
# Order (matches README "Round close"):
#   1. strict pytest at sf0.01 / 10 Hypothesis examples + strict
#      full-registry driver_sim hash sweep at sf0.01 (strict_suite.sh)
#   2. strict full-registry driver_sim hash sweep at sf0.1
#   3. python bench.py          (headline + tail, the driver contract)
#      python bench.py --full   (whole registry -> bench_full_registry)
#   4. regenerate COVERAGE.md / PLANS.md
#   5. write VALIDATION_r{N}.txt with per-step timestamps, exit codes,
#      and the git SHA each step ran against
#
# The script APPENDS to the validation log as it goes and exits
# non-zero on the first failing step, so a half-finished close is
# visible in the artifact, never silently absent. Commit order is
# still on the operator: code commits first, VALIDATION last.
set -uo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/round_close.sh <round-number>}"
LOG="VALIDATION_r${ROUND}.txt"

note() {
    echo "[$(date -u +%FT%TZ)] $*" | tee -a "$LOG"
}

run_step() {
    local name="$1"; shift
    note "START ${name} @ $(git rev-parse --short HEAD) :: $*"
    local t0=$SECONDS
    if "$@" >>"$LOG.steps" 2>&1; then
        note "PASS  ${name} ($((SECONDS - t0))s)"
    else
        local rc=$?
        note "FAIL  ${name} rc=${rc} ($((SECONDS - t0))s) — see $LOG.steps"
        exit "$rc"
    fi
}

: > "$LOG"
: > "$LOG.steps"
note "round_close r${ROUND} begin; HEAD=$(git rev-parse --short HEAD); dirty=$(git status --porcelain | wc -l) files"

run_step hash_lint         python tools/hash_lint.py
run_step strict_suite      bash tools/strict_suite.sh
run_step sweep_sf0.1       python tools/driver_sim.py --sf /root/testdata/sf0.1
run_step bench_headline    python bench.py
run_step bench_full        python bench.py --full
run_step gen_coverage      bash -c 'python tools/gen_coverage.py > COVERAGE.md'
run_step gen_plans         bash -c 'python tools/gen_plans.py > PLANS.md'

note "round_close r${ROUND} complete: all steps green"
echo
echo "Now: commit code + regenerated artifacts, then commit $LOG LAST."
