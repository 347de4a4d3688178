#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (exactly) with the engine
result parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq


def read_engine(f):
    # timestamp_as_object keeps timestamps as python datetimes instead of
    # datetime64[ns]: pandas ns-conversion WRAPS out-of-range values
    # (9999-12-31 -> 1816-03-29) on BOTH engine and oracle sides, which
    # masked the i11 INT96 write bug locally while the driver (which
    # hashes stringified values) failed it. Never let ns-wrap touch the
    # compare.
    meta = pq.read_metadata(f)
    # engine-wide event-horizon guard: no dumped file may carry INT96
    # timestamps — arrow converts INT96 to int64 NANOS, which wraps
    # far-future sentinels before any value compare can see them
    for i in range(meta.num_columns):
        col = meta.schema.column(i)
        if col.physical_type == "INT96":
            raise AssertionError(
                f"{f}: column '{col.name}' is INT96 — engine parquet "
                "must be INT64 TIMESTAMP_MICROS (Catalog.sessionConfs)")
        # tz guard (round-9 blind spot): an isAdjustedToUTC=true footer
        # reads back as datetime64[us, UTC] in the driver's pandas while
        # the DuckDB oracle is tz-naive — schema+hash fail at the driver
        # even though timestamp_as_object below drops the tzinfo and
        # values look equal locally. The local mirror must fail exactly
        # when the driver fails: every dumped timestamp must be NTZ
        # (Catalog.dumpNormalize casts TimestampType → TimestampNTZType
        # at the Verify dump boundary).
        lt = col.logical_type
        if lt.type == "TIMESTAMP" and "isAdjustedToUTC=true" in str(lt):
            raise AssertionError(
                f"{f}: column '{col.name}' is UTC-adjusted TIMESTAMP — "
                "engine dumps must be tz-naive (Catalog.dumpNormalize)")
    return pq.read_table(f).to_pandas(timestamp_as_object=True)


def fetch_oracle(con, sql):
    return con.execute(sql).fetch_arrow_table().to_pandas(
        timestamp_as_object=True)

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = fetch_oracle(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output"); n_bad += 1; continue
        try:
            got = pd.concat([read_engine(f) for f in sorted(files)])
        except AssertionError as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs oracle {sorted(exp.columns)}")
            n_bad += 1; continue
        g, e = norm(got), norm(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        bad_cols = []
        # the driver hashes STRINGIFIED values, so an int64 engine column
        # vs a float64 oracle column (e.g. DuckDB HUGEINT -> float) is a
        # hash mismatch even when numerically equal — flag kind drift.
        # int64-vs-uint64 (and bool-vs-object-bool) stringify identically,
        # so the driver's hash would match — treat those kinds as compatible
        def kinds_compatible(a, b):
            if a == b:
                return True
            pair = {a, b}
            return pair <= {"i", "u"} or pair <= {"b", "O"}
        kind_bad = [(c, g[c].dtype.kind, e[c].dtype.kind) for c in g.columns
                    if not kinds_compatible(g[c].dtype.kind, e[c].dtype.kind)]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind drift (engine vs oracle) {kind_bad}")
            n_bad += 1; continue
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            eq = (pd.isna(gv) & pd.isna(ev)) | (gv == ev)
            if not eq.all():
                i = int(np.argmin(eq))
                bad_cols.append((c, gv[i], ev[i]))
        if bad_cols:
            print(f"FAIL {name}: value mismatch {bad_cols[:3]}"); n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
