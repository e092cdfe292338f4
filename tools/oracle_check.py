#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (outDir/<name>/ parquet + oracle_sql.json)
against DuckDB on the same sf tables, compares:
  - row count, column names (sorted), and
  - values: exact for non-floats, strict-then-tolerant for floats
    (reports which level passed so we know hash-match risk).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; stringify for hash-like compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], out


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None, True
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


def main():
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
        got = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracles:
            n_noracle += 1
            print(f"  {name}: NO-ORACLE rows={len(got)}"
                  f" ({'ok' if len(got) > 0 else 'EMPTY!'})")
            continue
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            n_fail += 1
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"  {name}: COLUMN-MISMATCH got={gc} exp={ec}")
            continue
        if len(gr) != len(er):
            n_fail += 1
            print(f"  {name}: ROWCOUNT got={len(gr)} exp={len(er)}")
            continue
        # compare without assuming row order: sort stringified rows
        key = lambda r: tuple(repr(x) for x in r)
        gr_s, er_s = sorted(gr, key=key), sorted(er, key=key)
        exact_all, tol_all, first_bad = True, True, None
        for i, (g, e) in enumerate(zip(gr_s, er_s)):
            for j, (gv, ev) in enumerate(zip(g, e)):
                ex, tl = cell_eq(gv, ev)
                exact_all &= ex
                if not tl and first_bad is None:
                    first_bad = (i, gc[j], gv, ev)
                tol_all &= tl
        if tol_all:
            n_pass += 1
            lvl = "EXACT" if exact_all else "TOLERANT(float-noise!)"
            print(f"  {name}: PASS [{lvl}] rows={len(gr)}")
        else:
            n_fail += 1
            i, c, gv, ev = first_bad
            print(f"  {name}: VALUE-MISMATCH row={i} col={c}"
                  f" got={gv!r} exp={ev!r}")
    print(f"== pass={n_pass} fail={n_fail} no-oracle={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
