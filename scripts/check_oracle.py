"""Local emulation of the driver's correctness gate: run every queries()
entry at a given sf next to its oracle_sql() (DuckDB over the same
parquet), compare row count + schema + order-insensitive values.

The driver hashes the pandas VALUES of both sides after a column sort —
so a nullable ``Int64`` engine column against a ``float64`` oracle column
hash-mismatches even when every value is equal (CORRECTNESS_r04
lag_lead_events / closeness_parts).  This gate therefore compares dtype
KIND (int / uint / float / bool / object / datetime) per column before
comparing values — ``check_dtype=False`` alone has a blind spot exactly
where the driver's hash does not (VERDICT r4 item 3).

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


def _kind(dtype) -> str:
    """Collapse a dtype to the representation class the driver's hash is
    sensitive to: nullable Int64 and int64 are both 'i'; float64 is 'f';
    pandas StringDtype and object both normalize to 'O'."""
    k = getattr(dtype, "kind", "O")
    if k == "u":  # unsigned ints hash like ints once values match
        return "i"
    if str(dtype) in ("string", "string[python]", "string[pyarrow]"):
        return "O"
    return k


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Return the list of mismatch descriptions (empty = gate-green).

    Mirrors the driver's compare: sort columns by name, check row count,
    column names, per-column dtype KIND and null representation, then
    order-insensitive exact values.
    """
    status: list[str] = []
    if len(got) != len(want):
        status.append(f"rowcount {len(got)} != {len(want)}")
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        status.append(f"columns {gcols} != {wcols}")
        return status
    # dtype-kind + null-representation check BEFORE value normalization:
    # this is the class the old check_dtype=False compare silently passed
    for c in gcols:
        gk, wk = _kind(got[c].dtype), _kind(want[c].dtype)
        if gk != wk:
            status.append(
                f"dtype kind mismatch on '{c}': engine {got[c].dtype} ({gk})"
                f" vs oracle {want[c].dtype} ({wk})")
        elif got[c].isna().sum() != want[c].isna().sum():
            status.append(
                f"null count mismatch on '{c}': engine {int(got[c].isna().sum())}"
                f" vs oracle {int(want[c].isna().sum())}")
    if status:
        return status
    g, w = normalize(got), normalize(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)
    except AssertionError as e:
        status.append(f"values differ: {str(e).splitlines()[-1][:200]}")
    return status


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
        status = compare_frames(got, want)
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"OK    {name}: {len(got)} rows match ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
