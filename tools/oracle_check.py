#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (outDir/<name>/ parquet + oracle_sql.json)
against DuckDB on the same sf tables, compares:
  - row count, column names (sorted),
  - Arrow-level column TYPES (the driver hashes typed values: a DuckDB
    HUGEINT rendered as decimal128 hashes differently from Spark's
    int64 even when the values agree — the exact skew that made
    q77 red in round 4 while fetchall()'s Python ints hid it), and
  - values: exact for non-floats, strict-then-tolerant for floats
    (reports which level passed so we know hash-match risk).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
       python3 tools/oracle_check.py --selftest
"""
import json, math, sys, tempfile
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def arrow_rows(tbl, cols):
    """Materialize an Arrow table as row tuples in the given column order."""
    col_lists = [tbl.column(c).to_pylist() for c in cols]
    return list(zip(*col_lists)) if col_lists and tbl.num_rows else []


def canon_arrow(tbl):
    """Column names sorted, matching Arrow type strings, row tuples."""
    names = sorted(tbl.schema.names)
    types = [str(tbl.schema.field(n).type) for n in names]
    return names, types, arrow_rows(tbl, names)


def cell_eq(a, b):
    if a is None or b is None:
        # NULL vs value is a REAL difference at any tolerance — the
        # driver hashes it red, so waving it through as "tolerant"
        # (the old behavior) hid exactly the null-centroid class
        eq = a is None and b is None
        return eq, eq
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        tol = abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, tol
    return a == b, a == b


def max_match(ok, n_es):
    """Maximum bipartite matching (Kuhn's augmenting paths, ITERATIVE —
    a bucket of all-float rows can hold the whole table, and the old
    recursive augment hit Python's ~1000-frame recursion limit there,
    crashing the checker instead of producing a red/green row).
    ok[i] lists the candidate e-indices for g-row i. Returns
    (match_of_e, unmatched_g_rows)."""
    match_of_e = [None] * n_es
    unmatched = []
    for root in range(len(ok)):
        seen = set()
        # frame = [g_row, edge iterator, e-edge from the parent frame]
        stack = [[root, iter(ok[root]), None]]
        matched = False
        while stack:
            g, it, _ = stack[-1]
            step = None  # None = frame exhausted
            for j in it:
                if j in seen:
                    continue
                seen.add(j)
                step = j
                break
            if step is None:
                stack.pop()  # dead end — resume the parent's iterator
            elif match_of_e[step] is None:
                # free e-node: flip matches along the path down the stack
                match_of_e[step] = g
                for k in range(len(stack) - 1, 0, -1):
                    match_of_e[stack[k][2]] = stack[k - 1][0]
                matched = True
                break
            else:
                stack.append(
                    [match_of_e[step], iter(ok[match_of_e[step]]), step])
        if not matched:
            unmatched.append(root)
    return match_of_e, unmatched


def compare(name, got_tbl, exp_tbl):
    """Compare two Arrow tables; return (ok, message)."""
    gc, gt, gr = canon_arrow(got_tbl)
    ec, et, er = canon_arrow(exp_tbl)
    if gc != ec:
        return False, f"COLUMN-MISMATCH got={gc} exp={ec}"
    if gt != et:
        skew = [f"{c}: spark={a} oracle={b}"
                for c, a, b in zip(gc, gt, et) if a != b]
        return False, ("TYPE-SKEW (driver hashes typed values!) "
                       + "; ".join(skew))
    if len(gr) != len(er):
        return False, f"ROWCOUNT got={len(gr)} exp={len(er)}"
    # Pair rows in two stages. Stage 1: bucket both sides by their
    # NON-FLOAT cells (exact-typed — no cross-engine noise, so a bucket
    # mismatch is a REAL value difference). Stage 2 inside each bucket:
    # sort by a float-stable 9-significant-digit key and compare
    # pairwise; if any pair misses tolerance, retry that bucket with
    # greedy within-tolerance matching before declaring a mismatch —
    # two floats equal within 1e-9 can still format to different
    # 9-digit strings when they straddle a rounding boundary
    # (...x4999 vs ...x5001), so the two sorted orders may disagree
    # even though a valid pairing exists. Greedy (O(m^2)) runs only in
    # the bucket where sorted pairing failed; the common case stays
    # one sort.
    is_float = [t in ("halffloat", "float", "double") for t in gt]

    def key_cell(x):
        if isinstance(x, float):
            return "nan" if math.isnan(x) else f"{x:.9g}"
        return repr(x)
    key = lambda r: tuple(key_cell(x) for x in r)

    def bucket_key(r):
        return tuple(repr(x) for x, f in zip(r, is_float) if not f)
    gb, eb = {}, {}
    for r in gr:
        gb.setdefault(bucket_key(r), []).append(r)
    for r in er:
        eb.setdefault(bucket_key(r), []).append(r)
    for k in sorted(set(gb) | set(eb)):
        ng, ne = len(gb.get(k, [])), len(eb.get(k, []))
        if ng != ne:
            return False, (f"VALUE-MISMATCH non-float cells {k} appear "
                           f"{ng}x in got vs {ne}x in oracle")

    def row_eq(g, e):
        """(all-exact, all-within-tolerance) across one row pair."""
        ex_all = tl_all = True
        for gv, ev in zip(g, e):
            ex, tl = cell_eq(gv, ev)
            ex_all &= ex
            tl_all &= tl
        return ex_all, tl_all

    exact_all, tol_all, first_bad = True, True, None
    for k in sorted(gb):
        gs, es = sorted(gb[k], key=key), sorted(eb[k], key=key)
        pairs = list(zip(gs, es))
        if not all(row_eq(g, e)[1] for g, e in pairs):
            # Maximum bipartite matching (augmenting paths): greedy
            # first-fit can strand a row whose only tolerant partner
            # was claimed by a row that had alternatives — a falsely
            # red gate on exactly the float-noise class this pairing
            # exists to absorb. Buckets are small by construction
            # (non-float cells split the rows), so O(V·E) is fine.
            ok = [[j for j, e in enumerate(es) if row_eq(g, e)[1]]
                  for g in gs]
            match_of_e, unmatched = max_match(ok, len(es))
            if unmatched:
                tol_all = False
                if first_bad is None:
                    i = unmatched[0]
                    # point at the sorted-position partner's first bad
                    # cell when there is one; otherwise that partner
                    # happens to pair cell-by-cell (it was just claimed
                    # by another row), so report the stranded row itself
                    bad = next(((c, gv, ev) for c, gv, ev
                                in zip(gc, gs[i], es[i])
                                if not cell_eq(gv, ev)[1]), None)
                    first_bad = (f"col={bad[0]} got={bad[1]!r} "
                                 f"exp={bad[2]!r}") if bad else \
                        f"no oracle row within tolerance for got row {gs[i]!r}"
            pairs = [(gs[match_of_e[j]], es[j]) for j in range(len(es))
                     if match_of_e[j] is not None]
        for g, e in pairs:
            exact_all &= row_eq(g, e)[0]
    if tol_all:
        lvl = "EXACT" if exact_all else "TOLERANT(float-noise!)"
        return True, f"PASS [{lvl}] rows={len(gr)}"
    return False, f"VALUE-MISMATCH {first_bad}"


def selftest():
    """Prove the checker flags the q77 class: an uncast DuckDB sum
    (HUGEINT/decimal128) vs a Spark-style BIGINT parquet column whose
    VALUES agree exactly."""
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        # "Spark side": parquet with an int64 total, value 6.
        con.execute(
            f"COPY (SELECT CAST('a' AS VARCHAR) AS k, CAST(6 AS BIGINT)"
            f" AS total) TO '{d}/got.parquet' (FORMAT PARQUET)")
        got = con.execute(f"SELECT * FROM '{d}/got.parquet'")\
                 .fetch_arrow_table()
        # Uncast oracle: sum(BIGINT) -> HUGEINT -> arrow decimal128.
        bad = con.execute(
            "SELECT 'a' AS k, sum(x) AS total FROM (VALUES (CAST(1 AS"
            " BIGINT)), (2), (3)) t(x)").fetch_arrow_table()
        ok_bad, msg_bad = compare("selftest-uncast", got, bad)
        # Cast oracle: the fix — identical values AND types.
        good = con.execute(
            "SELECT 'a' AS k, CAST(sum(x) AS BIGINT) AS total FROM"
            " (VALUES (CAST(1 AS BIGINT)), (2), (3)) t(x)")\
            .fetch_arrow_table()
        ok_good, msg_good = compare("selftest-cast", good, got)
        # Boundary straddle: floats equal within 1e-9 can format to
        # DIFFERENT 9-digit sort keys (...4999 vs ...5001) and flip the
        # two sides' sort orders — the greedy rescue must pair them.
        lo, hi = "0.1234567894999", "0.1234567895001"
        got_b = con.execute(
            f"SELECT CAST(v AS DOUBLE) v, CAST(w AS DOUBLE) w FROM"
            f" (VALUES ({lo}, 2), ({hi}, 1)) t(v, w)").fetch_arrow_table()
        exp_b = con.execute(
            f"SELECT CAST(v AS DOUBLE) v, CAST(w AS DOUBLE) w FROM"
            f" (VALUES ({hi}, 2), ({lo}, 1)) t(v, w)").fetch_arrow_table()
        ok_b, msg_b = compare("selftest-boundary", got_b, exp_b)
        # ...and a REAL float difference must still go red
        bad_b = con.execute(
            "SELECT CAST(v AS DOUBLE) v, CAST(w AS DOUBLE) w FROM"
            " (VALUES (0.5, 2), (0.7, 1)) t(v, w)").fetch_arrow_table()
        ok_bad2, msg_bad2 = compare("selftest-realdiff", got_b, bad_b)
        # Stranded partner: g1 tolerates BOTH oracle rows, g2 only e1.
        # Greedy first-fit hands g1 e1 and strands g2 (falsely red);
        # the augmenting matching must recover g1->e2, g2->e1.
        g1a, g1b = 1.0, 1.0 + 9e-10
        e1v, e2a, e2b = 1.0 + 4.5e-10, 1.0 + 5.4e-10, 1.0 + 1.62e-9

        def tbl(rows):
            vals = ", ".join(
                f"(CAST({a!r} AS DOUBLE), CAST({b!r} AS DOUBLE))"
                for a, b in rows)
            return con.execute(
                f"SELECT * FROM (VALUES {vals}) t(v, w)")\
                .fetch_arrow_table()
        ok_m, msg_m = compare("selftest-matching",
                              tbl([(g1a, g1b), (g1b, g1a)]),
                              tbl([(e1v, e1v), (e2a, e2b)]))
        # Deep augmenting chain: row i greedily claims e_{i+1}, so the
        # last row (whose only option is e_{n-1}) must flip the ENTIRE
        # chain back to i->e_i — an n-frame augmenting path. At 5000
        # rows the old recursive augment died on RecursionError (the
        # all-float-columns single-bucket class); the iterative matcher
        # must both survive and fully match it.
        n_chain = 5000
        chain_ok = [[i + 1, i] for i in range(n_chain - 1)] + [[n_chain - 1]]
        chain_match, chain_um = max_match(chain_ok, n_chain)
        # NULL vs value in a float column is a real difference
        ok_n, msg_n = compare(
            "selftest-null",
            con.execute("SELECT CAST(NULL AS DOUBLE) v").fetch_arrow_table(),
            con.execute("SELECT CAST(1.0 AS DOUBLE) v").fetch_arrow_table())
    assert not ok_bad and "TYPE-SKEW" in msg_bad, \
        f"checker MISSED the uncast sum: {msg_bad}"
    assert ok_good, f"checker rejected the cast sum: {msg_good}"
    assert ok_b and "TOLERANT" in msg_b, \
        f"boundary-straddle rows mispaired: {msg_b}"
    assert not ok_bad2 and "VALUE-MISMATCH" in msg_bad2, \
        f"checker MISSED a real float difference: {msg_bad2}"
    assert ok_m, \
        f"augmenting matching failed to pair strandable rows: {msg_m}"
    assert chain_um == [] and sorted(
        j for j in chain_match if j is not None) == list(range(n_chain)), \
        f"deep chain not fully matched: {len(chain_um)} unmatched"
    assert not ok_n and "VALUE-MISMATCH" in msg_n, \
        f"checker waved through NULL vs value in a float column: {msg_n}"
    print(f"selftest: uncast sum flagged ({msg_bad.split(';')[0].strip()});"
          " cast sum passes; boundary straddle pairs ({});"
          " stranded partner recovered; 5000-deep chain matched;"
          " NULL-vs-value red; real float diff red. OK".format(msg_b))


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            # one empty/partial dump dir (a query that failed mid-write,
            # the r6 class) must count as ONE red row, not abort the
            # whole report before the remaining queries are compared
            got_tbl = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            n_fail += 1
            print(f"  {name}: DUMP-READ-ERROR {e}")
            continue
        if name not in oracles:
            n_noracle += 1
            ok_rows = got_tbl.num_rows > 0
            if not ok_rows:
                # the no-oracle contract is a rows-only check — an empty
                # result IS the failure signal, so it must gate
                n_fail += 1
            print(f"  {name}: NO-ORACLE rows={got_tbl.num_rows}"
                  f" ({'ok' if ok_rows else 'EMPTY — counted as FAIL'})")
            continue
        try:
            exp_tbl = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            n_fail += 1
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            continue
        ok, msg = compare(name, got_tbl, exp_tbl)
        n_pass += ok
        n_fail += not ok
        print(f"  {name}: {msg}")
    print(f"== pass={n_pass} fail={n_fail} no-oracle={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
