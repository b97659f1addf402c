#!/usr/bin/env bash
# Seed-randomized fixture audit — converts "EXACT on the fixture" into
# "EXACT on the family" (round-13 punch-list item 1).
#
# Regenerates a schema-identical, domain-identical corpus under a fresh
# seed (graft.FixtureGen), runs the full Verify dump against it, and
# compares every oracle query in DuckDB exactly like the driver does.
#
# Usage: scripts/seed_audit.sh <seed> [sf]         (default sf 0.01)
#        SPARK_GRAFT_FIXTURE_SEED=<seed> scripts/seed_audit.sh
#
# Exit 0 = ALL OK (every oracle query EXACT, rows-only non-empty).
set -euo pipefail
cd "$(dirname "$0")/.."

SEED="${1:-${SPARK_GRAFT_FIXTURE_SEED:?pass a seed or set SPARK_GRAFT_FIXTURE_SEED}}"
SF="${2:-0.01}"
FIX="target/fixtures/seed${SEED}_sf${SF}"
OUT="target/verify_seed${SEED}_sf${SF}"

sbt -batch "runMain graft.FixtureGen $SEED $SF $FIX /root/testdata/sf$SF"
sbt -batch "runMain graft.Verify $FIX $OUT"
python3 scripts/check_oracle.py "$FIX" "$OUT"
