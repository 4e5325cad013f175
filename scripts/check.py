#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--present-only]

--present-only: skip oracle entries with no spark output dir (for
sampled runs — `graft.Verify --sample` dumps ~20 queries, not all).

For each <name> dir in verifyOutDir: load spark parquet result, run the
matching oracle_sql.json SQL in DuckDB against views over <sfDir>'s
parquet tables, sort columns by name + rows by value, compare cell by
cell (exact for non-floats; report max abs diff for floats).
NOT shipped to the driver — developer tooling only (python/duckdb are
driver-side utilities, the Scala library never depends on them).
"""
import sys, os, json, math, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def key(row):
    return tuple((x is None, str(x)) for x in row)

def main(sf_dir, out_dir, present_only=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            if present_only: continue
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if [c.lower() for c in wcols] != [c.lower() for c in gcols]:
            print(f"FAIL {name}: cols want={wcols} got={gcols}"); n_fail += 1
            continue
        w = [tuple(r) for r in want[wcols].itertuples(index=False)]
        g = [tuple(r) for r in got[gcols].itertuples(index=False)]
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}"); n_fail += 1
            continue
        w.sort(key=key); g.sort(key=key)
        bad = 0; maxdiff = 0.0
        for rw, rg in zip(w, g):
            for a, b in zip(rw, rg):
                if a is None and b is None: continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        fa, fb = float(a), float(b)
                        if math.isnan(fa) and math.isnan(fb): continue
                        d = abs(fa - fb)
                        maxdiff = max(maxdiff, d)
                        if fa != fb: bad += 1
                        continue
                except (TypeError, ValueError):
                    pass
                if str(a) != str(b):
                    bad += 1
                    if bad <= 3:
                        print(f"  {name} cell mismatch: {a!r} != {b!r}")
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches (max float diff {maxdiff})")
            n_fail += 1
        else:
            extra = f" (max float diff {maxdiff})" if maxdiff else ""
            print(f"PASS {name}: {len(w)} rows{extra}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--present-only"]
    sys.exit(main(args[0], args[1], "--present-only" in sys.argv))
