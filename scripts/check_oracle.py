"""Local emulation of the driver's correctness gate: run every queries()
entry at a given sf next to its oracle_sql() (DuckDB over the same
parquet), compare row count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            elif isinstance(res, pd.DataFrame):
                got = res
            else:
                got = res.to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows ({dt:.1f}s, rows-only check)")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"columns {list(g.columns)} != {list(w.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append(f"values differ: {str(e).splitlines()[-1][:200]}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"OK    {name}: {len(g)} rows match ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
