#!/usr/bin/env python3
"""Strict compare of Verify output vs DuckDB oracle: NO float coercion.

Reports, per query, any divergence in: arrow schema types, exact cell
reprs (after sorting cols by name and rows by value). This reproduces a
type/rendering-sensitive hash check more faithfully than check.py.

Usage: python3 scripts/strictdiff.py <sfDir> <verifyOutDir> [name...]
Developer tooling only (not shipped).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def key(row):
    return tuple((x is None, str(x)) for x in row)

def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); continue
        try:
            wrel = con.execute(sql)
            want_t = wrel.fetch_arrow_table()
        except Exception as e:
            print(f"{name}: oracle error {e}"); continue
        got_t = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        ws = {f.name.lower(): str(f.type) for f in want_t.schema}
        gs = {f.name.lower(): str(f.type) for f in got_t.schema}
        type_diff = {c: (ws.get(c), gs.get(c))
                     for c in set(ws) | set(gs) if ws.get(c) != gs.get(c)}
        if type_diff:
            print(f"{name}: TYPE DIFF {type_diff}")
        wcols = sorted(want_t.schema.names, key=str.lower)
        gcols = sorted(got_t.schema.names, key=str.lower)
        w = [tuple(r) for r in zip(*[want_t.column(c).to_pylist() for c in wcols])] if wcols else []
        g = [tuple(r) for r in zip(*[got_t.column(c).to_pylist() for c in gcols])] if gcols else []
        if len(w) != len(g):
            print(f"{name}: ROWS want={len(w)} got={len(g)}"); continue
        w.sort(key=key); g.sort(key=key)
        bad = 0
        for rw, rg in zip(w, g):
            for c, a, b in zip(wcols, rw, rg):
                if repr(a) != repr(b):
                    bad += 1
                    if bad <= 5:
                        print(f"  {name}.{c}: oracle={a!r} ({type(a).__name__})"
                              f" spark={b!r} ({type(b).__name__})")
        if bad:
            print(f"{name}: {bad} strict cell diffs")
        elif not type_diff:
            print(f"{name}: OK ({len(w)} rows)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
