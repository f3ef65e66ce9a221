#!/bin/sh
# Full correctness gate — run this (not a targeted re-gate) before any commit
# that touches a SHARED helper (shuffle/util/hashing/gorilla/wavelet, the
# _ln_fp fixed point, _docs/_rolled_events readers, memoized folds, oracle
# templates). Rationale: round-3's rolling_corr_24h regression was introduced
# by an edit to ANOTHER query's identical call-site string and survived every
# targeted re-gate of the edited queries — only a full sweep catches the
# blast radius of shared code (round-3 VERDICT item #5).
#
# Usage: scripts/full_gate.sh [sf_dir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
exec python scripts/check_queries.py "${1:-/root/testdata/sf0.01}"
