#!/usr/bin/env bash
# Round-close strict gate. `pytest tests/ -q` defaults to sf0.001 /
# 4 Hypothesis examples so day-to-day CI stays under the 5-minute
# budget; that means the stronger settings only run when someone
# remembers the env overrides. This script IS the remembering: it runs
# the whole suite at the driver's sf0.01 with the full example count,
# then the strict no-float-tolerance registry sweep, and is part of the
# round-close ritual (see README "Round close").
#
# Usage: tools/strict_suite.sh [extra pytest args]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== strict pytest: sf0.01, 10 Hypothesis examples =="
SPARK_GRAFT_ORACLE_SF="${SPARK_GRAFT_ORACLE_SF:-/root/testdata/sf0.01}" \
SPARK_GRAFT_PROP_EXAMPLES="${SPARK_GRAFT_PROP_EXAMPLES:-10}" \
python -m pytest tests/ -q "$@"

echo "== strict driver-sim sweep: full registry, hash compare =="
python tools/driver_sim.py --sf /root/testdata/sf0.01
