#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:  python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [name ...]

With trailing names, checks only those queries (resume / shard big runs).

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB
against the sf_dir tables, and compares: row count, sorted-column schema,
and exact cell values after sorting rows by all columns.

This is a dev-only harness (driver-side python env); the shipped library is
pure Scala/Spark.
"""
import sys, os, json, glob, math, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def _float_bits(col):
    """Float column -> integer bit patterns with canonical NaN: equality
    becomes BIT-exact (distinguishing -0.0 from 0.0, which pandas
    `.equals` would conflate) while any-NaN == any-NaN regardless of
    payload — the same semantics as the slow path's canon/repr cells.
    Returns None for non-float dtypes."""
    import numpy as np
    a = col.to_numpy()
    if a.dtype.kind != "f" or a.dtype.itemsize not in (4, 8):
        return None
    a = a.copy()
    a[np.isnan(a)] = np.nan  # canonical NaN bits, dtype preserved
    import pandas as pd
    return pd.Series(
        a.view(np.int64 if a.dtype.itemsize == 8 else np.int32),
        index=col.index)


def fast_compare(got, exp):
    """Sorted-frame equality via pandas; None = not eligible, fall back."""
    if [str(d) for d in got.dtypes] != [str(d) for d in exp.dtypes]:
        return None
    for c in got.columns:
        if str(got[c].dtype) == "object":
            s = got[c].dropna()
            if len(s) and not isinstance(s.iloc[0], str):
                return None
    got, exp = got.copy(deep=False), exp.copy(deep=False)
    for c in got.columns:
        gb = _float_bits(got[c])
        if gb is not None:
            got[c], exp[c] = gb, _float_bits(exp[c])
    cols = list(got.columns)
    try:
        g = got.sort_values(cols, na_position="last", kind="mergesort") \
            .reset_index(drop=True)
        e = exp.sort_values(cols, na_position="last", kind="mergesort") \
            .reset_index(drop=True)
        return bool(g.equals(e))
    except TypeError:
        # mixed-type object column the first-element sniff missed — fall
        # back to the exact driver-replica path instead of crashing the run
        return None


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_noracle = 0
    for name in names:
        t0 = time.time()
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output", flush=True)
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows", flush=True)
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}", flush=True)
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}", flush=True)
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}", flush=True)
            n_fail += 1
            continue
        # Fast path for multi-million-row frames (the sf1/skew sweeps):
        # vectorized pandas sort + frame equality over float BIT patterns
        # (canonical NaN) instead of python tuple reprs (which cost
        # minutes and GBs at 50M rows). Semantics match the slow path —
        # -0.0 != 0.0, any NaN == any NaN; requires identical dtypes and
        # no non-string object columns, else falls back to the exact
        # driver-replica compare.
        fast = None
        if len(got) > 500_000:
            fast = fast_compare(got, exp)
        if fast is not None:
            if fast:
                print(f"PASS {name}: {len(got)} rows ({time.time() - t0:.1f}s fast)",
                      flush=True)
                n_pass += 1
            else:
                print(f"FAIL {name}: value mismatch (fast path)", flush=True)
                n_fail += 1
            continue
        g = sorted(tuple(canon(v) for v in row) for row in got.itertuples(index=False))
        e = sorted(tuple(canon(v) for v in row) for row in exp.itertuples(index=False))
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows ({time.time() - t0:.1f}s)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
