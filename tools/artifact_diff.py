#!/usr/bin/env python3
"""Round-start drift check: diff two CORRECTNESS_r{N}.json artifacts.

The engine's mains catch per-query exceptions so one throwing query
cannot abort a whole verification run — the flip side is that a broken
query VANISHES from the artifact instead of going red (r6: a testdata
regen changed events.ts encoding and CORRECTNESS shrank 109->106 with
every remaining row green). This tool makes the round-start check a one
-liner:

    python3 tools/artifact_diff.py CORRECTNESS_r06.json CORRECTNESS_r07.json
    python3 tools/artifact_diff.py --bench BENCH_r07.json
    python3 tools/artifact_diff.py --bench BENCH_r06.json BENCH_r07.json

Exit code 1 if queries disappeared, any check regressed pass->fail, or
the bench artifact carries a non-empty "failed" list. The two-artifact
--bench form additionally lists per-query deltas >2x and >0.5 s — triage
candidates for the isolated fresh-JVM re-measurement protocol
(BASELINE.md), NOT verdicts: the host band swings identical code 2x.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def ok(entry):
    if not isinstance(entry, dict):
        return False
    return all(entry.get(k) for k in ("rows_match", "schema_match", "hash_match")) \
        and not entry.get("err")


def diff_correctness(prev_path, cur_path):
    prev, cur = load(prev_path), load(cur_path)
    rc = 0
    gone = sorted(set(prev) - set(cur))
    new = sorted(set(cur) - set(prev))
    if gone:
        rc = 1
        print(f"LOST {len(gone)} queries (likely THROWING, not failing red — "
              f"check Verify's _failed.json / stderr): {', '.join(gone)}")
    if new:
        print(f"new queries ({len(new)}): {', '.join(new)}")
    regressed = sorted(k for k in set(prev) & set(cur) if ok(prev[k]) and not ok(cur[k]))
    if regressed:
        rc = 1
        for k in regressed:
            print(f"REGRESSED {k}: {cur[k]}")
    still_bad = sorted(k for k in cur if not ok(cur[k]) and k not in regressed)
    if still_bad:
        rc = 1
        print(f"failing ({len(still_bad)}): {', '.join(still_bad)}")
    print(f"== prev={len(prev)} cur={len(cur)} lost={len(gone)} "
          f"new={len(new)} regressed={len(regressed)}")
    return rc


def bench_queries(b):
    """Per-query seconds from a bench artifact: parsed.queries if the
    driver kept it, else scraped from the stdout tail (which truncates
    the FRONT, so this is the visible suffix, not the full set)."""
    parsed = b.get("parsed") if "parsed" in b else b
    qs = (parsed or {}).get("queries")
    if qs:
        return dict(qs), True
    return dict((m.group(1), float(m.group(2))) for m in
                re.finditer(r'"(q[^"]+)":([0-9.eE+-]+)', b.get("tail", ""))), False


def bench_failed(b):
    """Names of queries that THREW, from the artifact's 'failed' list
    (parsed if the driver kept it, else scraped from the stdout tail)."""
    parsed = b.get("parsed") if "parsed" in b else b
    failed = (parsed or {}).get("failed") or []
    if not failed and "tail" in b:
        m = re.search(r'"failed":\[([^\]]*)\]', b["tail"])
        if m:
            failed = [s.strip('" ') for s in m.group(1).split(",")
                      if s.strip()]
    return set(failed)


def diff_bench(prev_path, cur_path):
    prev, cur = load(prev_path), load(cur_path)
    qp, full_p = bench_queries(prev)
    qc, full_c = bench_queries(cur)
    # a query that THREW records a fail-fast placeholder time and its
    # name in "failed" — comparing a thrown run would report a
    # since-FIXED query as "REGRESSED>2x" and skew the common-set
    # totals. Exclude by the failed NAME lists, not by a 0.0 sentinel:
    # a legitimately recorded 0.0-duration (sub-resolution query) must
    # stay in the comparison.
    failed = bench_failed(prev) | bench_failed(cur)
    common = sorted(k for k in set(qp) & set(qc) if k not in failed)
    if not (full_p and full_c):
        print(f"(tail-scraped: {len(qp)}/{len(qc)} queries visible — "
              f"common set only)")
    sp, sc = sum(qp[k] for k in common), sum(qc[k] for k in common)
    print(f"common {len(common)} queries: {sp:.1f} -> {sc:.1f} s "
          f"(ratio {sc / sp:.2f})" if sp else "no common queries")
    suspicious = [(qc[k] - qp[k], k) for k in common
                  if qc[k] > 2 * qp[k] and qc[k] - qp[k] > 0.5]
    for d, k in sorted(suspicious, reverse=True):
        print(f"  REGRESSED>2x {k}: {qp[k]:.2f} -> {qc[k]:.2f} s "
              f"(re-measure isolated before optimizing)")
    return check_bench(cur_path)


def check_bench(path):
    b = load(path)
    # driver artifact: {"parsed": {...}|null, "tail": "..."} — or the raw
    # bench JSON line itself when pointed at local output
    parsed = b.get("parsed") if "parsed" in b else b
    failed = bench_failed(b)
    if failed:
        print(f"BENCH ran {len(failed)} queries to a THROW (their times are "
              f"fail-fast, the total under-counts): {', '.join(sorted(failed))}")
        return 1
    total = (parsed or {}).get("value")
    if total is None:
        # parsed:null is the r3/r4 failure class this gate exists to
        # catch (result line truncated out of the driver's stdout tail)
        # — "ok, total=None" passing silently defeats the gate
        print("BENCH total is ABSENT (parsed null / truncated tail) — "
              "no bench number of record for this round")
        return 1
    rc = b.get("rc")
    if rc not in (None, 0):
        print(f"BENCH process exited rc={rc} — total {total} is suspect")
        return 1
    print(f"== bench ok, total={total}")
    return 0


def usage(msg=None):
    """Print the module docstring as usage (the documented round-start
    one-liner must fail with guidance, not a bare traceback)."""
    if msg:
        print(f"error: {msg}", file=sys.stderr)
    print(__doc__.strip(), file=sys.stderr)
    sys.exit(2)


def main():
    args = sys.argv[1:]
    if args[:1] == ["--bench"]:
        if len(args) == 2:
            sys.exit(check_bench(args[1]))
        if len(args) == 3:
            sys.exit(diff_bench(args[1], args[2]))
        usage("--bench takes one or two bench artifacts")
    if len(args) != 2:
        usage("expected two correctness artifacts (prev cur)")
    sys.exit(diff_correctness(args[0], args[1]))


if __name__ == "__main__":
    main()
