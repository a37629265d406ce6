"""Local oracle sweep mirroring the driver protocol.

For every key present in BOTH ``queries()`` and ``oracle_sql()``: run the
Ray pipeline and the DuckDB SQL over the same sf dir, then compare
row count, sorted-column-name schema, and order-insensitive values
(floats compared with tolerance; everything else exactly).

Usage:  python tools/sweep.py [sf_dir] [only_query ...]
Prints one line per query and a final summary; exit code 1 on any red.
"""
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    sort_cols = list(df.columns)
    # stable order-insensitive sort key: floats round to the compare
    # tolerance FIRST (stringifying raw floats would misalign rows whose
    # values are tolerance-equal but print differently, e.g.
    # 0.30000000000000004 vs 0.3), everything else stringifies
    key = pd.DataFrame({
        c: (pd.to_numeric(df[c], errors="coerce").round(8).astype(str)
            if pd.api.types.is_float_dtype(df[c]) else df[c].astype(str))
        for c in df.columns})
    order = key.sort_values(sort_cols, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"schema {sorted(a.columns)} != {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = pd.to_numeric(av, errors="coerce").to_numpy(dtype=float)
            bb = pd.to_numeric(bv, errors="coerce").to_numpy(dtype=float)
            ok = np.isclose(aa, bb, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"col {c}: {aa[i]!r} != {bb[i]!r} (row {i})"
        else:
            sa, sb = av.astype(str), bv.astype(str)
            neq = (sa != sb).to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                return f"col {c}: {sa.iloc[i]!r} != {sb.iloc[i]!r} (row {i})"
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = m.queries(), m.oracle_sql()
    keys = [k for k in qs if k in os_]
    if only:
        keys = [k for k in keys if k in only]
    red = []
    t_all = time.time()
    for k in keys:
        t0 = time.time()
        try:
            got = to_pandas(qs[k](sf))
            exp = con.execute(os_[k]).df()
            err = compare(got, exp)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t0
        if err:
            red.append(k)
            print(f"RED   {k:42s} {dt:6.1f}s  {err}", flush=True)
        else:
            print(f"green {k:42s} {dt:6.1f}s", flush=True)
    print(f"== {len(keys) - len(red)}/{len(keys)} green "
          f"in {time.time() - t_all:.0f}s; red: {red}")
    ray.shutdown()
    sys.exit(1 if red else 0)


if __name__ == "__main__":
    main()
