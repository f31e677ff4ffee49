#!/usr/bin/env bash
# Freshness gate for PLANS.md: fails unless the stamped generating commit
# contains the latest change to src/main (i.e. no plan-affecting code
# landed after the last regen). Run as the final step of the close ritual
# (tools/close.sh calls it) and any time before citing PLANS.md.
set -euo pipefail
cd "$(dirname "$0")/.."
STAMP=$(grep -m1 '^Generated at commit: ' PLANS.md | awk '{print $4}' || true)
if [ -z "$STAMP" ]; then
  echo "check_plans.sh: PLANS.md carries no 'Generated at commit:' stamp —" >&2
  echo "regenerate with tools/close.sh" >&2
  exit 1
fi
LAST_MAIN=$(git log -1 --format=%H -- src/main)
if ! git merge-base --is-ancestor "$LAST_MAIN" "$STAMP" 2>/dev/null; then
  echo "check_plans.sh: PLANS.md is STALE — src/main last changed at" >&2
  echo "  $LAST_MAIN" >&2
  echo "but PLANS.md was generated at" >&2
  echo "  $STAMP" >&2
  echo "which does not contain it. Re-run tools/close.sh." >&2
  exit 1
fi
echo "check_plans.sh: PLANS.md is fresh (stamp $STAMP covers the last src/main change)"
