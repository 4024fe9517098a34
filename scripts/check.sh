#!/usr/bin/env bash
# Pre-snapshot gate: the compile-light smoke tier (<3 min warm on the 1-core
# host).  MANDATORY before any end-of-round / milestone commit — round 4
# shipped a red HEAD because a test file was swept into the final snapshot
# without any suite run (VERDICT round 4, Weak #2).  Tiers:
#   scripts/check.sh                 -> smoke gate (this script)
#   pytest tests/ -m 'not slow' -q   -> mid tier (~15 min)
#   pytest tests/ -q                 -> full suite (~25 min)
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m smoke -q "$@"
