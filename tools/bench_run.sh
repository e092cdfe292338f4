#!/bin/sh
# Bench runner with WHOLE-stdout capture (VERDICT r12 #4). Never pipe
# the live Bench run through `grep | tail` — that drops the per-query
# JSON line the contention protocol (BASELINE.md) needs for common-sum
# ratios and calib comparison. This captures the COMPLETE output to a
# timestamped file first, then prints the compact total line from it.
#
#     tools/bench_run.sh [sfDir] [logDir]
#
# Exit code is sbt's. The full log path is printed last so certification
# chains can cite it.
set -u
sf="${1:-/root/testdata/sf0.1}"
logdir="${2:-/tmp/graft_bench_logs}"
cd "$(dirname "$0")/.." || exit 2
mkdir -p "$logdir"
# $$ keeps two runs started within the same second from silently
# overwriting each other's full log — the artifact this script preserves
log="$logdir/bench_$(date +%Y%m%d_%H%M%S)_$$.log"
echo "== bench_run: SPARK_GRAFT_SF_DIR=$sf -> $log"
SPARK_GRAFT_SF_DIR="$sf" sbt -batch "runMain graft.Bench" > "$log" 2>&1
rc=$?
if [ "$rc" -ne 0 ]; then
    echo "== bench FAILED (rc=$rc) — tail of $log:" >&2
    tail -20 "$log" >&2
    exit "$rc"
fi
# the file already holds everything; extracting from it loses nothing —
# but an sbt rc=0 run with NO metric line is a no-data non-success
metric=$(grep '"metric"' "$log" | tail -1)
if [ -z "$metric" ]; then
    echo "== bench produced NO metric line (rc=0) — tail of $log:" >&2
    tail -20 "$log" >&2
    exit 1
fi
echo "$metric"
echo "== full bench output: $log"
exit 0
