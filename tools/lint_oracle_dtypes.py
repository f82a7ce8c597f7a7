#!/usr/bin/env python3
"""Oracle-side dtype lint: DESCRIBE each oracle SQL in DuckDB and fail on
surfaced types the driver compare cannot hash-match against Spark output.

DuckDB widens aggregates past what Spark surfaces — SUM(BIGINT) returns
HUGEINT, integer AVG returns DOUBLE via DECIMAL, SUM(DECIMAL) widens the
scale — and the driver's fetch materializes HUGEINT/DECIMAL cells as
float64 while Spark surfaces int64. The driver hashes cell
REPRESENTATIONS, so "123.0" vs "123" is a red row even when every value
is integer-equal (round-10 agg_gini / classify_gini_impurity). The rule:
any oracle expression that widens past BIGINT must be CAST back before
surfacing. This lint is static (DESCRIBE, no execution), so it runs in
milliseconds per query and catches the whole widening class before a
roundtrip ever runs.

Usage:
  lint_oracle_dtypes.py <oracle_sql.json> <sfDir>   # lint a Verify dump
  lint_oracle_dtypes.py --sql '<SQL>' <sfDir>       # lint one query
Exit 1 if any query surfaces a banned type.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose pandas fetch diverges from the int64/float64/object plane
# Spark parquet output lands on: HUGEINT/DECIMAL -> float64-or-object
# drift, unsigned ints -> uint* dtypes.
BANNED_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL",
                   "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def lint_one(con, name, sql):
    """Returns a list of (column, type) violations for one query."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if r[1].upper().startswith(BANNED_PREFIXES)]


def main():
    if sys.argv[1] == "--sql":
        queries = {"<cli>": sys.argv[2]}
        sf_dir = sys.argv[3]
    else:
        queries = json.load(open(sys.argv[1]))
        sf_dir = sys.argv[2]
    con = connect(sf_dir)
    n_bad = 0
    for name in sorted(queries):
        try:
            bad = lint_one(con, name, queries[name])
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_bad += 1
            continue
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: surfaces widened type(s) [{cols}] — "
                  f"CAST aggregate-derived outputs back to BIGINT/DOUBLE")
            n_bad += 1
        else:
            print(f"ok   {name}")
    print(f"\n{len(queries) - n_bad} ok, {n_bad} failed (dtype lint)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
