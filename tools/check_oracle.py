#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the <sfDir>
tables, sorts columns by name, and compares row-by-row with EXACT value
equality (the engine is designed to be bit-exact; see core/Exact.scala).
Exit code 1 if any query mismatches.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # array-valued cells come back as numpy arrays / lists, whose == is
    # elementwise; normalize to tuples so row comparison stays scalar
    if hasattr(v, "tolist"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        mine_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{mine_glob}')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read engine output: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ\n  got {gc}\n  exp {ec}")
            n_bad += 1
            continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f"FAIL {name}: row count {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        if grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}\n  got {grows[bad]}\n  exp {erows[bad]}")
            # show dtypes to debug schema-level drift
            print(f"  got dtypes: {dict(got.dtypes.astype(str))}")
            print(f"  exp dtypes: {dict(exp.dtypes.astype(str))}")
            n_bad += 1
            continue
        # Driver parity: the driver hashes cell REPRESENTATIONS, so a
        # dtype KIND drift (e.g. DuckDB HUGEINT->float64 vs Spark int64:
        # "123.0" vs "123") is a hash mismatch there even when values
        # are numerically equal. FAIL, not WARN. Width-only drift inside
        # a kind (int32 vs int64) prints identically and stays green —
        # same as the driver.
        gk = {c: got[c].dtype.kind for c in gc}
        ek = {c: exp[c].dtype.kind for c in gc}
        if gk != ek:
            bad_cols = [c for c in gc if gk[c] != ek[c]]
            print(f"FAIL {name}: values equal but dtype kinds differ "
                  f"on {bad_cols} (driver hashes representations)\n"
                  f"  got dtypes: {dict(got.dtypes.astype(str))}\n"
                  f"  exp dtypes: {dict(exp.dtypes.astype(str))}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(got)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(oracle)} oracle-checked")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
