#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify for a
query subset, then execute each oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values (columns sorted by name, values
compared at FULL precision — no float rounding: the r10 lesson is that a
9dp-rounded local gate passes queries the driver's stricter hash
canonicalization fails; a query must fail HERE first).

r11 lesson: the gate must also be TYPE-faithful. DuckDB types any un-CAST
SUM(...) as HUGEINT (int128 → Arrow decimal128(38,0)) while Spark writes
int64. Values fetch identically through the Python client (HUGEINT comes
back as a plain int, so repr-level comparison sees no difference), which
made this gate say OK for three rounds while the driver's TYPE-SENSITIVE
hash failed the same five queries. We now DESCRIBE both sides and fail on
any column-type mismatch BEFORE comparing values.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]
Run graft.Verify first, e.g.:
  SPARK_GRAFT_VERIFY_ONLY=embed_topk_pq sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/v01"
"""
import json, sys, glob, os
import duckdb

def described_types(con, query_sql):
    """column_name -> DuckDB type string for the query's result schema."""
    rows = con.execute(f"DESCRIBE {query_sql}").fetchall()
    return {r[0]: r[1] for r in rows}

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            vals.append(repr(r[i]))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'"
                        if os.path.isfile(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: NO SPARK OUTPUT")
            failures += 1
            continue
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        try:
            sq = con.execute(f"SELECT * FROM read_parquet({files})")
            s_rows, s_cols = sq.fetchall(), [d[0] for d in sq.description]
        except Exception as e:
            print(f"{name}: SPARK OUTPUT READ ERROR: {e}")
            failures += 1
            continue
        try:
            oq = con.execute(sql)
            o_rows, o_cols = oq.fetchall(), [d[0] for d in oq.description]
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        try:
            s_types = described_types(
                con, f"SELECT * FROM read_parquet({files})")
            o_types = described_types(con, f"({sql})")
        except Exception as e:
            print(f"{name}: DESCRIBE ERROR: {e}")
            failures += 1
            continue
        type_mismatch = {
            c: (s_types.get(c), o_types.get(c))
            for c in sorted(set(s_types) | set(o_types))
            if s_types.get(c) != o_types.get(c)}
        sc, scols = canon(s_rows, s_cols)
        oc, ocols = canon(o_rows, o_cols)
        if type_mismatch:
            print(f"{name}: TYPE MISMATCH (spark, oracle): {type_mismatch}")
            failures += 1
        elif scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            failures += 1
        elif len(sc) != len(oc):
            print(f"{name}: ROWS {len(sc)} vs {len(oc)}")
            failures += 1
        elif sc != oc:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
            print(f"{name}: VALUE MISMATCH e.g. {diff}")
            failures += 1
        else:
            print(f"{name}: OK ({len(sc)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
