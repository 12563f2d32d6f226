#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Loads each <out_dir>/<name>/ parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sf_dir tables, sorts columns by
name and rows by all columns, and compares values exactly.
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        # Array cells are unhashable (pandas factorize crashes mid-sort), so
        # sort on a tuple-ized shadow frame and reorder the original rows.
        key = df.copy()
        for c in key.columns:
            if key[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                # Null/NaN cells in an array-typed column must become tuples
                # too (tuple vs float compares raise TypeError mid-sort), and
                # must stay distinguishable from a genuine empty array —
                # hence the (rank, payload) shape: nulls first, then arrays.
                key[c] = key[c].map(
                    lambda v: (1,) + tuple(v)
                    if isinstance(v, (list, np.ndarray))
                    else ((0,) if v is None or (isinstance(v, float) and math.isnan(v))
                          else (2, repr(v))))
        order = key.sort_values(by=list(key.columns), kind="mergesort",
                                na_position="first").index
        df = df.loc[order].reset_index(drop=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    # The driver's hash is type-KIND-sensitive: int64 5 vs float64 5.0 failed
    # (q18 in r01) while int32 vs int64 row_number passed (q12) — so compare
    # dtype kinds (i/u vs f vs O vs M vs b), not exact widths. Python's
    # 5 == 5.0 coercion is what hid the q18 fail locally in round 1.
    def kind(dt):
        k = dt.kind
        return "i" if k == "u" else k
    for c in a.columns:
        if kind(a[c].dtype) != kind(b[c].dtype):
            return (f"DTYPE col={c}: spark={a[c].dtype} vs oracle={b[c].dtype} "
                    f"(kind {a[c].dtype.kind} vs {b[c].dtype.kind})")
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            # pd.isna covers None, float NaN, and NaT (NaT != NaT is True,
            # so a raw x != y would flag legitimately-null timestamp pairs).
            # Array cells (list-typed columns) aren't scalars — compare
            # element-wise with the same kind- and NaN-sensitivity as
            # scalars (a bare list(x) == list(y) would coerce 5 == 5.0 and
            # fail matching NaNs).
            ax, ay = isinstance(x, (list, np.ndarray)), isinstance(y, (list, np.ndarray))
            if ax or ay:
                if not (ax and ay) or len(x) != len(y):
                    return f"VALUE col={c} row={i}: spark={x!r} oracle={y!r}"
                for j, (xe, ye) in enumerate(zip(x, y)):
                    ne_x, ne_y = bool(pd.isna(xe)), bool(pd.isna(ye))
                    if ne_x and ne_y:
                        continue
                    int_x = isinstance(xe, (int, np.integer)) and not isinstance(xe, bool)
                    int_y = isinstance(ye, (int, np.integer)) and not isinstance(ye, bool)
                    flt_x = isinstance(xe, (float, np.floating))
                    flt_y = isinstance(ye, (float, np.floating))
                    if int_x != int_y or flt_x != flt_y:
                        return (f"DTYPE col={c} row={i} elem={j}: "
                                f"spark={type(xe).__name__} vs oracle={type(ye).__name__}")
                    if ne_x != ne_y or xe != ye:
                        return f"VALUE col={c} row={i} elem={j}: spark={xe!r} oracle={ye!r}"
                continue
            nx, ny = bool(pd.isna(x)), bool(pd.isna(y))
            if nx and ny:
                continue
            if nx != ny or x != y:
                return f"VALUE col={c} row={i}: spark={x!r} oracle={y!r}"
    return None

def main():
    # Optional: --json PATH writes a CORRECTNESS-style artifact (the
    # driver's per-query schema: rows/schema/hash match booleans + row
    # counts + err) alongside the human-readable lines. argparse, not
    # positional filtering: `--json` as the final arg must error loudly,
    # and an out_dir that happens to equal the JSON path must survive.
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write a CORRECTNESS-style per-query JSON artifact")
    ns = ap.parse_args()
    out_dir, sf_dir, json_out = ns.out_dir, ns.sf_dir, ns.json_out
    results = {}
    def record(name, err=None, spark_rows=None, oracle_rows=None, check="oracle"):
        e = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": spark_rows, "oracle_rows": oracle_rows,
             "err": None, "check": check}
        if err is not None:
            e["err"] = err
            kind = err.split(" ")[0]
            if kind in ("SCHEMA", "DTYPE"):
                e["schema_match"] = False; e["hash_match"] = False
            elif kind == "ROWS":
                e["rows_match"] = False; e["hash_match"] = False
            else:
                e["hash_match"] = False
            if kind == "FAIL":
                e["rows_match"] = e["schema_match"] = e["hash_match"] = False
        results[name] = e
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(glob.glob(f"{out_dir}/*/"))
    # A query that crashed in Verify writes NO result dir — it must count as
    # a failure, not silently shrink the denominator. The manifest covers
    # no-oracle queries too; fall back to oracle keys if it's absent.
    have = {p.rstrip("/").split("/")[-1] for p in names}
    try:
        expected = set(open(f"{out_dir}/query_names.txt").read().split())
    except OSError:
        expected = set(oracle)
    missing = sorted(expected - have)
    for name in missing:
        print(f"FAIL {name}: no result written (query crashed in Verify?)")
        record(name, err="FAIL no result written (query crashed in Verify?)")
    n_total = len(names) + len(missing)
    for path in names:
        name = path.rstrip("/").split("/")[-1]
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{path}*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            record(name, err=f"FAIL cannot read spark result: {e}")
            continue
        if name not in oracle:
            # mimic the driver's rows-only check: a no-oracle query returning
            # 0 rows must fail locally too, not green-light.
            if len(spark_df) == 0:
                print(f"FAIL {name}: no oracle and 0 result rows")
                record(name, err="FAIL no oracle and 0 result rows", check="rows_only")
            else:
                print(f"SKIP {name}: no oracle (rows-only check: {len(spark_df)} rows)")
                record(name, spark_rows=len(spark_df), check="rows_only")
                n_ok += 1
            continue
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            record(name, err=f"FAIL oracle sql error: {e}", spark_rows=len(spark_df))
            continue
        err = cmp(canon(spark_df), canon(ora_df))
        record(name, err=err, spark_rows=len(spark_df), oracle_rows=len(ora_df))
        if err:
            print(f"FAIL {name}: {err}")
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok}/{n_total} pass ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(results.items())), f, indent=1)
        print(f"wrote {json_out}")
    if n_ok != n_total:
        sys.exit(1)

if __name__ == "__main__":
    main()
