#!/usr/bin/env bash
# Fixture-served correctness gate (round-15 verdict task #6): runs the full
# Verify dump with GRAFT_VERIFY_FIXTURES=1 — every persisted fixture is
# obtained BEFORE the dump so the queries run the store-served paths the
# benches actually exercise — then the DuckDB compare, and leaves a
# committed machine-readable artifact beside the driver's CORRECTNESS_r*.
#
# Usage: tools/verify_fixtures.sh [sfDir] [artifact]
#   default sfDir    /root/testdata/sf0.01 (the driver's gate SF)
#   default artifact CORRECTNESS_fixtures.json
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
ARTIFACT="${2:-CORRECTNESS_fixtures.json}"
OUT=$(mktemp -d /tmp/graft_verify_fx.XXXXXX)
export GRAFT_VERIFY_FIXTURES=1
sbt -batch "runMain graft.Verify $SF_DIR $OUT"
python3 tools/compare.py "$SF_DIR" "$OUT" --json "$ARTIFACT"
echo "verify_fixtures.sh: artifact written to $ARTIFACT"
