#!/bin/sh
# Round-start drift gate — run FIRST each round, before building.
#
#     tools/round_start.sh [repo_root]
#
# Auto-discovers the two newest CORRECTNESS_r{N}.json and the newest
# BENCH_r{N}.json in the repo root and runs tools/artifact_diff.py over
# them. Exit code 1 if any query VANISHED (a throwing query shrinks the
# artifact instead of going red — the r6 failure class), regressed
# pass->fail, or the bench carries a non-empty "failed" list; 0 when the
# surface is intact. With fewer than two correctness artifacts (round 1)
# it reports and exits 0 — nothing to diff yet.
set -u
root="${1:-$(dirname "$0")/..}"
cd "$root" || exit 2

# Committed-tree guard (VERDICT r12 #3): round start certifies the
# COMMITTED tree, and every certification tool compiles the WORKING
# tree — so the round-start chain is meaningless if editing has begun.
# Driver artifacts (*.md/*.json in the root) don't affect compilation
# and are exempt; anything under src/, build.sbt or project/ fails.
# fail CLOSED: a failing git (no .git, corrupted repo, git off PATH)
# exits non-zero with empty stdout — that is NOT a clean tree. stderr
# stays separate so a success-path git warning can't masquerade as a
# dirty file list.
# mktemp, not a predictable $$-suffixed name in world-writable /tmp (a
# pre-created symlink could redirect the write); fail CLOSED if it fails
giterr=$(mktemp) || exit 1
if ! dirty=$(git status --porcelain src/ build.sbt project/ 2>"$giterr"); then
    echo "== round-start gate: FAILED — git status itself failed:" >&2
    cat "$giterr" >&2; rm -f "$giterr"
    exit 1
fi
rm -f "$giterr"
if [ -n "$dirty" ]; then
    echo "== round-start gate: FAILED — the tree is already DIRTY; this gate certifies the COMMITTED tree:" >&2
    echo "$dirty" | sed 's/^/==   /' >&2
    exit 1
fi
echo "== committed-tree guard: clean (src/ build.sbt project/)"

# newest two by round number (version sort: r10 > r9)
corr=$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -2)
set -- $corr
rc=0
if [ "$#" -ge 2 ]; then
    echo "== correctness drift: $1 -> $2"
    python3 tools/artifact_diff.py "$1" "$2" || rc=1
else
    echo "== fewer than two CORRECTNESS artifacts — nothing to diff"
fi

bench=$(ls BENCH_r*.json 2>/dev/null | sort -V | tail -1)
if [ -n "$bench" ]; then
    echo "== bench check: $bench"
    python3 tools/artifact_diff.py --bench "$bench" || rc=1
fi

[ "$rc" -eq 0 ] && echo "== round-start gate: OK" \
    || echo "== round-start gate: FAILED — the query surface shrank or regressed; fix before building" >&2
exit "$rc"
