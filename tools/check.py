#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev feedback loop only —
NOT part of the shipped library). Usage:

    python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads oracle_sql.json from the verify output dir, runs each oracle in
DuckDB with the sf tables registered as views, reads the Spark parquet
dump for the same query, sorts columns by name (like the driver), and
compares row counts, schemas (names), and exact cell values.
"""
import sys, json, glob, math
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        errs = []
        if list(exp.columns) != list(got.columns):
            errs.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
        elif len(exp) != len(got):
            errs.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            for c in exp.columns:
                ev, gv = exp[c].tolist(), got[c].tolist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    same = (a == b) or (a is None and b is None)
                    try:
                        if not same and isinstance(a, float) and isinstance(b, float):
                            same = (math.isnan(a) and math.isnan(b)) or a == b
                    except TypeError:
                        pass
                    # pandas NaN/NaT/None normalization (NaT == NaT is
                    # False, like NaN; pd.isna covers every null flavor)
                    if not same:
                        try:
                            import pandas as pd
                            same = bool(pd.isna(a)) and bool(pd.isna(b))
                        except (TypeError, ValueError):
                            an = a is None or (isinstance(a, float) and math.isnan(a))
                            bn = b is None or (isinstance(b, float) and math.isnan(b))
                            same = an and bn
                    if not same:
                        errs.append(f"col {c} row {i}: exp={a!r} got={b!r}")
                        break
            # dtype check (loose): flag float-vs-int and object-vs-num
            for c in exp.columns:
                ek, gk = exp[c].dtype.kind, got[c].dtype.kind
                if ek != gk and {ek, gk} != {"O"}:
                    errs.append(f"dtype {c}: exp={exp[c].dtype} got={got[c].dtype}")
        if errs:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(errs[:3]))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(exp)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
