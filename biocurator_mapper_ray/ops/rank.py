"""Ranking operators: exact top-k rows per group.

No reference equivalent (biocurator_mapper ranks only its k=5 Weaviate
candidates per request — ``app/ontology_searcher.py:95-151``); this is
the general distributed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_column


def top_k_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tiebreak_col: str | None = None,
    shards: int = 32,
):
    """Exact top-``k`` rows per group by ``order_col`` (desc by default),
    ties broken by ``tiebreak_col`` ascending — fully deterministic.

    Map-side combiner push-down: each batch first reduces to ITS top-k
    per group (a batch can't contribute more than k rows to any group's
    final top-k), so the exchange ships ≤ batches×groups×k rows instead
    of the whole table; the shard merge then takes the per-group top-k
    over the salted group-hash shard (a group's rows all land in one
    shard, so per-group results are final there).  Adds ``rn`` (1-based
    rank within the group).
    """
    sort_cols = [group_col, order_col] + ([tiebreak_col] if tiebreak_col else [])
    sort_asc = [True, ascending] + ([True] if tiebreak_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        df = df.groupby(group_col, sort=False).head(k)
        salt = (hash64_column(pa.Array.from_pandas(df[group_col].astype(str))
                              if df[group_col].dtype == object
                              else pa.Array.from_pandas(df[group_col]))
                % np.uint64(shards)).astype(np.int32)
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("__s", pa.array(salt))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__s")
        group = group.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        group = group.groupby(group_col, sort=False).head(k).copy()
        group["rn"] = group.groupby(group_col, sort=False).cumcount() + 1
        return group

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(merge, batch_format="pandas")
    )
