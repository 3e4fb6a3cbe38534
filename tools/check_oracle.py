#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL and compare row/schema/values per query.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
(run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first)
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: rows={len(got)}")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        bad = []
        typebad = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                # Type-parity gate: the driver's hasher renders 3 vs 3.0
                # differently, so an integer Spark column vs a float
                # oracle column (DuckDB sum(BIGINT) -> HUGEINT -> pandas
                # float) is a hash failure even when values agree. Catch
                # it locally: integer-vs-float dtype is a hard FAIL.
                ai = pd.api.types.is_integer_dtype(a)
                bi = pd.api.types.is_integer_dtype(b)
                af = pd.api.types.is_float_dtype(a)
                bf = pd.api.types.is_float_dtype(b)
                if (ai and bf) or (af and bi):
                    typebad.append(f"{c}: spark={a.dtype} oracle={b.dtype}")
                    continue
                if af or bf:
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                        bad.append(c)
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        bad.append(c)
            except Exception as e:
                bad.append(f"{c}({e})")
        if typebad:
            print(f"FAIL {name}: TYPE mismatch (add CAST in oracle): {typebad}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                cn = str(c).split("(")[0]
                if cn in g.columns:
                    diff = g[cn].astype(str).values != w[cn].astype(str).values
                    idx = [i for i, d in enumerate(diff) if d][:3]
                    for i in idx:
                        print(f"    row {i}: got={g[cn].iloc[i]!r} want={w[cn].iloc[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
