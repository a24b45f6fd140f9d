#!/usr/bin/env bash
# One-shot gate: compile + unit tests + oracle correctness + bench.
# Usage: scripts/check_all.sh [sfdir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/graft_verify.XXXX)
sbt -batch compile
sbt -batch test
sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/check_correctness.py "$SF" "$OUT"
SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" | grep -F '"metric"'
