#!/bin/sh
# Both-mode oracle certification (VERDICT r9 #2) — the standing round
# step that keeps the PRODUCTION mean path (spark.graft.exactMeans=false,
# the tree-reduced VecMean aggregate clusterBuilder presets) oracle-
# proven every round, not just the fold default Verify runs with.
#
#     tools/certify_means.sh [sfDir] [outRoot]
#
# Runs graft.Verify + tools/oracle_check.py TWICE at the given scale
# (default sf0.01, ~2 min/mode): once per exactMeans mode. Any red row
# in either mode exits 1. The exactMeans flag rides a -D system
# property: SparkConf absorbs spark.* sys-props at session build, so
# the forked Verify JVM picks it up with no code seam.
set -u
sf="${1:-/root/testdata/sf0.01}"
outroot="${2:-/tmp/graft_certify_means}"
cd "$(dirname "$0")/.." || exit 2

# Committed-tree guard (VERDICT r12 #3): sbt compiles the WORKING tree,
# so in-flight edits get silently certified (bit r12's round start).
# Always name the dirty files; under GRAFT_COMMITTED_TREE=1 (the
# round-start "this certifies the committed tree" claim) fail instead.
# fail CLOSED: a failing git (no .git, corrupted repo, git off PATH)
# exits non-zero with empty stdout — that is NOT a clean tree. stderr
# stays separate so a success-path git warning can't masquerade as a
# dirty file list.
# mktemp, not a predictable $$-suffixed name in world-writable /tmp (a
# pre-created symlink could redirect the write); fail CLOSED if it fails
giterr=$(mktemp) || exit 3
if ! dirty=$(git status --porcelain src/ build.sbt project/ 2>"$giterr"); then
    echo "== certify_means: git status itself failed:" >&2
    cat "$giterr" >&2; rm -f "$giterr"
    exit 3
fi
rm -f "$giterr"
if [ -n "$dirty" ]; then
    if [ "${GRAFT_COMMITTED_TREE:-0}" = "1" ]; then
        echo "== certify_means: REFUSING a committed-tree claim on a DIRTY tree:" >&2
        echo "$dirty" | sed 's/^/==   /' >&2
        echo "== commit (or stash) first, or drop GRAFT_COMMITTED_TREE=1 to certify the working tree" >&2
        exit 3
    fi
    echo "== certify_means: WARNING — certifying the WORKING tree; uncommitted:"
    echo "$dirty" | sed 's/^/==   /'
fi

# The full registered query surface, pinned as a LITERAL: a query
# dropped from BOTH SparkEntry.queries and oracleSql leaves nothing for
# the dump-vs-oracle diff below to notice (the r6 silent-shrink class),
# so the count itself is the gate. Feature-complete since r4 — a
# deliberate surface change updates this line in the same commit.
expected_queries=109

rc=0
for mode in true false; do
    out="$outroot/exactMeans_$mode"
    rm -rf "$out"
    mkdir -p "$outroot"
    echo "== certify_means: exactMeans=$mode at $sf"
    sbt -batch \
        "set run/javaOptions += \"-Dspark.graft.exactMeans=$mode\"" \
        "runMain graft.Verify $sf $out" \
        > "$outroot/verify_$mode.log" 2>&1 \
        || { echo "== Verify FAILED (exactMeans=$mode) — tail of $outroot/verify_$mode.log:"
             tail -20 "$outroot/verify_$mode.log"; rc=1; continue; }
    # A query that THROWS inside Verify exits 0 (per-query catch) and
    # simply has no dump dir, so oracle_check would report one fewer
    # green row and still pass — the r6 silent-shrink class. Gate on
    # Verify's own failure record, on every oracle query having a dump,
    # AND on the pinned total surface count.
    python3 - "$out" "$expected_queries" <<'PY'
import json, pathlib, sys
out, expected = pathlib.Path(sys.argv[1]), int(sys.argv[2])
failed = json.loads((out / "_failed.json").read_text())
assert not failed, f"Verify recorded failures: {sorted(failed)}"
oracles = json.loads((out / "oracle_sql.json").read_text())
dumps = {p.name for p in out.iterdir() if p.is_dir()}
missing = sorted(set(oracles) - dumps)
assert not missing, f"oracle queries with no dump: {missing}"
assert len(dumps) == expected, (
    f"query surface shrank: {len(dumps)} dumps vs the pinned "
    f"{expected} — a query was dropped from the registry")
PY
    [ $? -eq 0 ] || { echo "== Verify dump INCOMPLETE (exactMeans=$mode)"
                      rc=1; continue; }
    # capture to a file: a pipe would make $? report tail's status
    python3 tools/oracle_check.py "$sf" "$out" > "$out/check.log" 2>&1
    st=$?
    tail -1 "$out/check.log"
    [ "$st" -eq 0 ] || { grep -v "PASS \[" "$out/check.log"; rc=1; }
done
if [ "$rc" -eq 0 ]; then
    echo "== certify_means: BOTH modes oracle-green at $sf"
else
    echo "== certify_means: FAILURES (see above)"
fi
exit "$rc"
