#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name, and compares values exactly (with a float
diff report on mismatch).
"""
import duckdb, glob, json, math, sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)

def main(sf, out, json_out=None):
    if sf.rstrip("/").endswith("sf1"):
        # 10x-scale gate: refuse a corpus that doesn't byte-match the
        # committed manifest (round-10 verdict item 4)
        import os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import gen_sf1
        err = gen_sf1.check(sf)
        if err:
            sys.exit(f"error: {err}")
        print(f"(sf1 corpus {sf} matches committed manifest)")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # optional machine-readable artifact, same per-query shape as the
    # driver's CORRECTNESS_r*.json (round-10 verdict item 5: commit the
    # sf1 sweep as CHECK_sf1.json instead of prose)
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        def rec(rows=None, schema=None, hsh=None, srows=None, orows=None, err=None):
            results[name] = {"rows_match": rows, "schema_match": schema,
                             "hash_match": hsh, "spark_rows": srows,
                             "oracle_rows": orows, "err": err}
        if not files:
            print(f"FAIL {name}: no spark output"); rec(err="no_spark_output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); rec(err=str(e)[:200]); n_fail += 1; continue
        try:
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR: {e}"); rec(err="oracle: "+str(e)[:200]); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            rec(schema=False, srows=len(got), orows=len(want)); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            rec(rows=False, schema=True, srows=len(got), orows=len(want)); n_fail += 1; continue
        bad = []
        gv, wv = got.values.tolist(), want.values.tolist()
        for i in range(len(gv)):
            for j in range(len(got.columns)):
                if not eq(canon(gv[i][j]), canon(wv[i][j])):
                    bad.append((i, got.columns[j], gv[i][j], wv[i][j]))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches; first: {bad[:3]}")
            for (i, c, g, w) in bad[:3]:
                if isinstance(g, float) and isinstance(w, float):
                    print(f"   row {i} col {c}: spark={g!r} oracle={w!r} diff={g-w!r}")
            rec(rows=True, schema=True, hsh=False, srows=len(got), orows=len(want))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            rec(rows=True, schema=True, hsh=True, srows=len(got), orows=len(want))
            n_pass += 1
    # queries without oracle → rows-only
    all_dirs = {d.rstrip('/').split('/')[-1] for d in glob.glob(f"{out}/*/")}
    for name in sorted(all_dirs - set(oracle)):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n}")
        results[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": int(n),
                         "oracle_rows": None, "err": "no_oracle"}
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        json.dump(results, open(json_out, "w"), indent=0)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
