#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Dev tool only — NOT part of the graft library (the engine is pure
Scala/Spark; this script just pre-validates oracle SQL the same way the
driver does: run Verify first, then compare each parquet result with
the DuckDB result of the corresponding oracle_sql.json entry, sorting
columns by name and rows by all columns before comparing values).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: timestamps → ns, ints → int64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # Spark-written parquet timestamps are UTC-adjusted and read
            # back tz-aware; the driver's tables are tz-naive. Strip to
            # UTC-naive so both engines' results compare on the instant.
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _kind(col: pd.Series) -> str:
    """Coarse dtype kind used for the strict cross-engine check."""
    t = pd.api.types
    if t.is_bool_dtype(col):
        return "bool"
    if t.is_integer_dtype(col):
        return "int"
    if t.is_float_dtype(col):
        return "float"
    if t.is_datetime64_any_dtype(col):
        return "ts"
    return "obj"


def cmp(name, spark_df, duck_df):
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        return f"SCHEMA columns spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWS spark={len(s)} duck={len(d)}"
    for c in s.columns:
        a, b = s[c], d[c]
        # Dtype-strict, like the driver's value hash: an int64 column on
        # one engine vs a float64 on the other (e.g. an un-CAST DuckDB
        # HUGEINT sum) is a FAIL even when the numeric values agree.
        # norm() already folds all integer widths to int64, so a kind
        # mismatch here is a genuine cross-engine logical-type drift
        # that the oracle SQL must fix with an explicit CAST.
        ka, kb = _kind(a), _kind(b)
        if ka != kb:
            return (f"DTYPE col={c} spark={a.dtype}({ka}) "
                    f"duck={b.dtype}({kb}) — add an explicit CAST in the "
                    f"oracle SQL (driver hash is dtype-sensitive)")
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa, bb = a.astype(float), b.astype(float)
            bad = ~((aa == bb) | (aa.isna() & bb.isna()))
            if bad.any():
                i = bad.idxmax()
                mx = (aa - bb).abs().max()
                return f"VALUES col={c} row={i} spark={aa[i]!r} duck={bb[i]!r} maxabs={mx}"
        else:
            if not a.astype(str).equals(b.astype(str)):
                bad = a.astype(str) != b.astype(str)
                i = bad.idxmax()
                return f"VALUES col={c} row={i} spark={a[i]!r} duck={b[i]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"NO SPARK OUTPUT: {e}"
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        err = cmp(name, spark_df, duck_df)
        results[name] = err or f"OK ({len(spark_df)} rows)"
    # rows-only queries: present in output dir but not in oracle
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                # mimic the driver: canonicalize (sort by all columns) so
                # un-sortable outputs (raw arrays) fail here, not there
                df = norm(pd.read_parquet(p))
                n = len(df)
                if n > 0:
                    results[name] = f"ROWS-ONLY ({n} rows)"
                else:
                    results[name] = "ROWS-ONLY EMPTY (0 rows)"
            except Exception as e:
                results[name] = f"ROWS-ONLY READ/SORT ERROR: {e}"
    fails = 0
    for name, r in sorted(results.items()):
        flag = " " if r.startswith(("OK", "ROWS-ONLY (")) else "!"
        if flag == "!":
            fails += 1
        print(f"{flag} {name}: {r}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
