"""Distributed numeric moments: grouped count / mean / variance (and
covariance) that hash IDENTICALLY across engines.

No reference equivalent (biocurator_mapper aggregates only counts); the
standard statistical profile every curation dashboard needs — but done
so the float outputs are bit-exact against SQL: float64 running
aggregates (DuckDB's ``var_samp``, Welford-style) are summation-order-
dependent, so instead BOTH sides compute the same closed-form
expression over EXACT int64 sums (values → integer cents per row,
then Σx, Σx², Σxy as overflow-checked int64).  Integer sums are
order-independent; the final expression is the same float64 arithmetic
on both engines, hence bit-equal.

Overflow bound: the int64 state is the SUMS only (the n·Σx² finish
runs in float64), so with |x| ≤ X cents a group overflows Σx² at
n·X² ≥ 2⁶³ — e.g. X = 10⁵ cents allows ~9·10⁸ rows per group; use
coarser units (``cents=False`` on pre-scaled ints) for hotter groups.
Per-row squares use ``multiply_checked`` (raise, never wrap).

Scale shape: one map-side partial per batch (groups × 5 lean columns),
a small key groupby exchange, the closed-form finish vectorized on the
ALREADY AGGREGATED frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _to_cents(col, cents: bool):
    if cents:
        return pc.cast(pc.round(pc.multiply(col, 100.0), ndigits=0),
                       pa.int64())
    return pc.cast(col, pa.int64())


def grouped_moments(ds, *, key: str, value: str, cents: bool = True,
                    ddof: int = 1):
    """Per-key n, Σx (cents), mean and variance — the SQL mirror is

    ``(n*Sxx - Sx*Sx) / (n * (n - ddof))`` over the same BIGINT sums.

    Returns a Dataset of (key, n:int64, sum_cents:int64, mean:float64,
    var:float64); groups with n ≤ ddof get var = NULL (SQL var_samp
    semantics).
    """
    def partial(batch: pa.Table) -> pa.Table:
        x = _to_cents(batch.column(value), cents)
        xx = pc.multiply_checked(x, x)
        t = pa.table({key: batch.column(key), "__x": x, "__xx": xx})
        g = t.group_by([key], use_threads=False).aggregate(
            [("__x", "sum"), ("__xx", "sum"), ("__x", "count")])
        return g.rename_columns([key, "__sx", "__sxx", "__n"])

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, sort=False)[["__sx", "__sxx", "__n"]].sum()
        n = g["__n"].to_numpy().astype(np.int64)
        sx = g["__sx"].to_numpy().astype(np.int64)
        sxx = g["__sxx"].to_numpy().astype(np.int64)
        # the finish runs ENTIRELY in float64 with the same expression
        # order as the SQL mirror — IEEE ops on identical operands are
        # bit-equal, and float64 can't overflow where n·Σx² would
        nf, sxf, sxxf = (a.astype(np.float64) for a in (n, sx, sxx))
        mean = sxf / (nf * 100.0) if cents else sxf / nf
        denom = nf * (nf - float(ddof))
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.where(denom > 0,
                           (nf * sxxf - sxf * sxf)
                           / np.where(denom > 0, denom, 1.0),
                           np.nan)
        if cents:
            var = var / 10000.0
        return pa.table({
            key: pa.array(g.index.to_numpy()),
            "n": pa.array(n),
            "sum_cents" if cents else "sum_int": pa.array(sx),
            "mean": pa.array(mean, pa.float64()),
            "var": pa.array(np.where(np.isnan(var), None, var),
                            pa.float64(), from_pandas=True),
        })

    # partials are groups×batches lean rows; ONE salted exchange would
    # also work, but the frame is result-scale so a single groupby-key
    # map_groups keeps per-task memory at one group's partials
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(finish, batch_format="pyarrow"))


def grouped_covariance(ds, *, key: str, x: str, y: str, cents: bool = True,
                       ddof: int = 1):
    """Per-key sample covariance of two numeric columns, same exact-
    integer-sums construction: ``(n*Sxy - Sx*Sy) / (n * (n - ddof))``.

    Returns (key, n:int64, cov:float64); n ≤ ddof → NULL.
    """
    def partial(batch: pa.Table) -> pa.Table:
        xi = _to_cents(batch.column(x), cents)
        yi = _to_cents(batch.column(y), cents)
        t = pa.table({key: batch.column(key), "__x": xi, "__y": yi,
                      "__xy": pc.multiply_checked(xi, yi)})
        g = t.group_by([key], use_threads=False).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__x", "count")])
        return g.rename_columns([key, "__sx", "__sy", "__sxy", "__n"])

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, sort=False)[["__sx", "__sy", "__sxy", "__n"]].sum()
        n = g["__n"].to_numpy().astype(np.int64)
        nf = n.astype(np.float64)
        sxf = g["__sx"].to_numpy().astype(np.float64)
        syf = g["__sy"].to_numpy().astype(np.float64)
        sxyf = g["__sxy"].to_numpy().astype(np.float64)
        denom = nf * (nf - float(ddof))
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = np.where(denom > 0,
                           (nf * sxyf - sxf * syf)
                           / np.where(denom > 0, denom, 1.0),
                           np.nan)
        if cents:
            cov = cov / 10000.0
        return pa.table({
            key: pa.array(g.index.to_numpy()),
            "n": pa.array(n),
            "cov": pa.array(np.where(np.isnan(cov), None, cov),
                            pa.float64(), from_pandas=True),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(finish, batch_format="pyarrow"))


def zscore_by_group(ds, *, key: str, value: str, cents: bool = True,
                    ddof: int = 1, out_column: str = "z"):
    """Per-row standardization against the row's GROUP moments:
    ``z = (x − mean_g) / sqrt(var_g)`` — the outlier/quality score a
    curation pipeline computes per source or language before a global
    threshold.

    Two-phase broadcast pattern (the corpus_freq_scores shape): phase 1
    is :func:`grouped_moments` (exact integer sums → bit-stable group
    moments, a groups-scale frame); phase 2 broadcasts that frame via
    ``ray.put`` and standardizes map-side — no second exchange, the
    corpus streams once per phase.  The float64 expression order is the
    SQL mirror's (x_cents/100 − mean)/sqrt(var), so z hashes bit-equal.
    Groups with NULL variance (n ≤ ddof) or zero variance emit NULL z.
    """
    import ray

    mom = grouped_moments(ds, key=key, value=value, cents=cents,
                          ddof=ddof).to_pandas()
    mean_map = pd.Series(mom["mean"].to_numpy(), index=mom[key])
    var_map = pd.Series(mom["var"].to_numpy(), index=mom[key])
    moments_ref = ray.put((mean_map, var_map))

    def standardize(batch: pa.Table, moments_ref=None) -> pa.Table:
        mm, vm = (ray.get(moments_ref) if not isinstance(moments_ref, tuple)
                  else moments_ref)
        x = _to_cents(batch.column(value), cents).to_numpy(
            zero_copy_only=False).astype(np.float64)
        if cents:
            x = x / 100.0
        keys_s = pd.Series(batch.column(key).to_numpy(zero_copy_only=False))
        means = keys_s.map(mm).to_numpy(np.float64)  # C-level probe
        variances = keys_s.map(vm).to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            z = (x - means) / np.sqrt(variances)
        z = np.where(np.isfinite(z), z, np.nan)
        return batch.append_column(
            out_column, pa.array(z, pa.float64(), from_pandas=True))

    return ds.map_batches(standardize, fn_kwargs={"moments_ref": moments_ref},
                          batch_format="pyarrow")


def grouped_linfit(ds, *, key: str, x: str, y: str, cents: bool = True):
    """Per-key ordinary-least-squares line y = slope·x + intercept from
    the same exact int64 sums (Σx, Σy, Σxy, Σx², n):

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ᵗᵒᵗ)
        intercept = (Σy − slope·Σx) / n        [/100 in cents mode]

    Slope is scale-invariant under the cents encoding (the 100² factors
    cancel), the intercept divides back once; both finish expressions
    are single float64 formulas mirrored verbatim in SQL, so results
    hash bit-exactly (DuckDB's ``regr_slope`` would NOT — it accumulates
    floats in scan order).  Returns (key, n:int64, slope:float64,
    intercept:float64); a key with zero x-variance or n < 2 → NULLs.
    """
    def partial(batch: pa.Table) -> pa.Table:
        xi = _to_cents(batch.column(x), cents)
        yi = _to_cents(batch.column(y), cents)
        t = pa.table({key: batch.column(key), "__x": xi, "__y": yi,
                      "__xy": pc.multiply_checked(xi, yi),
                      "__xx": pc.multiply_checked(xi, xi)})
        g = t.group_by([key], use_threads=False).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__xx", "sum"), ("__x", "count")])
        return g.rename_columns([key, "__sx", "__sy", "__sxy", "__sxx",
                                 "__n"])

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, sort=False)[
            ["__sx", "__sy", "__sxy", "__sxx", "__n"]].sum()
        n = g["__n"].to_numpy().astype(np.int64)
        nf = n.astype(np.float64)
        sxf = g["__sx"].to_numpy().astype(np.float64)
        syf = g["__sy"].to_numpy().astype(np.float64)
        sxyf = g["__sxy"].to_numpy().astype(np.float64)
        sxxf = g["__sxx"].to_numpy().astype(np.float64)
        denom = nf * sxxf - sxf * sxf
        ok = (n >= 2) & (denom != 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = (nf * sxyf - sxf * syf) / np.where(ok, denom, 1.0)
            intercept = (syf - slope * sxf) / nf
        if cents:
            intercept = intercept / 100.0
        return pa.table({
            key: pa.array(g.index.to_numpy()),
            "n": pa.array(n),
            "slope": pa.array(np.where(ok, slope, None), pa.float64(),
                              from_pandas=True),
            "intercept": pa.array(np.where(ok, intercept, None),
                                  pa.float64(), from_pandas=True),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(finish, batch_format="pyarrow"))


def grouped_corr(ds, *, key: str, x: str, y: str, cents: bool = True):
    """Per-key Pearson correlation from exact int64 sums
    (Σx, Σy, Σxy, Σx², Σy², n):

        r = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)

    Unit-free: the cents scale factors cancel, so the finish is one
    float64 expression mirrored verbatim in SQL — bit-exact across
    engines, unlike DuckDB's native ``corr`` (scan-order float
    accumulation).  Returns (key, n:int64, corr:float64); a key with
    n < 2 or zero variance on either side → NULL.
    """
    def partial(batch: pa.Table) -> pa.Table:
        xi = _to_cents(batch.column(x), cents)
        yi = _to_cents(batch.column(y), cents)
        t = pa.table({key: batch.column(key), "__x": xi, "__y": yi,
                      "__xy": pc.multiply_checked(xi, yi),
                      "__xx": pc.multiply_checked(xi, xi),
                      "__yy": pc.multiply_checked(yi, yi)})
        g = t.group_by([key], use_threads=False).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__xx", "sum"), ("__yy", "sum"), ("__x", "count")])
        return g.rename_columns([key, "__sx", "__sy", "__sxy", "__sxx",
                                 "__syy", "__n"])

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, sort=False)[
            ["__sx", "__sy", "__sxy", "__sxx", "__syy", "__n"]].sum()
        n = g["__n"].to_numpy().astype(np.int64)
        nf = n.astype(np.float64)
        sxf = g["__sx"].to_numpy().astype(np.float64)
        syf = g["__sy"].to_numpy().astype(np.float64)
        sxyf = g["__sxy"].to_numpy().astype(np.float64)
        sxxf = g["__sxx"].to_numpy().astype(np.float64)
        syyf = g["__syy"].to_numpy().astype(np.float64)
        vx = nf * sxxf - sxf * sxf
        vy = nf * syyf - syf * syf
        ok = (n >= 2) & (vx > 0.0) & (vy > 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            # mirror the SQL literally: divide by each sqrt separately
            r = (nf * sxyf - sxf * syf) \
                / np.sqrt(np.where(ok, vx, 1.0)) \
                / np.sqrt(np.where(ok, vy, 1.0))
        return pa.table({
            key: pa.array(g.index.to_numpy()),
            "n": pa.array(n),
            "corr": pa.array(np.where(ok, r, None), pa.float64(),
                             from_pandas=True),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(finish, batch_format="pyarrow"))


def robust_scale_by_group(ds, *, key: str, value: str,
                          out_column: str = "rs",
                          coarse_bits: int = 16):
    """Per-row ROBUST standardization against the row's group:
    ``rs = (x − median_g) / (q75_g − q25_g)`` — the outlier-immune
    sibling of :func:`zscore_by_group` (median/IQR instead of
    mean/stddev; heavy tails can't drag the scale).

    Two-phase broadcast pattern: phase 1 is one
    :func:`~biocurator_mapper_ray.ops.quantile.grouped_quantiles_cont`
    run (all three quantiles of every group refine together — driver
    state is groups×3 scalars), phase 2 broadcasts the tiny frame via
    ``ray.put`` and standardizes map-side with ONE float64 expression
    mirrored verbatim in SQL — bit-exact.  Groups with zero IQR emit
    NULL.
    """
    import ray

    from .quantile import grouped_quantiles_cont

    qdf = grouped_quantiles_cont(ds, value, key, [0.25, 0.5, 0.75],
                                 coarse_bits=coarse_bits)
    med = qdf[qdf["q"] == 0.5].set_index(key)["value"]
    iqr = (qdf[qdf["q"] == 0.75].set_index(key)["value"]
           - qdf[qdf["q"] == 0.25].set_index(key)["value"])
    ref = ray.put((med, iqr))

    def standardize(batch: pa.Table, ref=None) -> pa.Table:
        mm, ii = (ray.get(ref) if not isinstance(ref, tuple) else ref)
        x = pc.cast(batch.column(value), pa.float64()).to_numpy(
            zero_copy_only=False)
        keys_s = pd.Series(batch.column(key).to_numpy(zero_copy_only=False))
        m = keys_s.map(mm).to_numpy(np.float64)
        s = keys_s.map(ii).to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rs = (x - m) / s
        rs = np.where(np.isfinite(rs), rs, np.nan)
        return batch.append_column(
            out_column, pa.array(rs, pa.float64(), from_pandas=True))

    return ds.map_batches(standardize, fn_kwargs={"ref": ref},
                          batch_format="pyarrow")


def minmax_scale_by_group(ds, *, key: str, value: str, cents: bool = True,
                          scale: int = 10_000, out_column: str = "bp"):
    """Per-row min-max normalization against the row's GROUP extrema,
    in INTEGER basis points: ``bp = (x − min_g) · scale // (max_g −
    min_g)`` (0 when the group is constant) — the bounded-range feature
    scaler, kept integer end-to-end so the oracle hashes bit-exactly
    (a float (x−mn)/(mx−mn) would be division-order-stable but its
    VARCHAR forms diverge; integer floor-div is engine-exact, and the
    numerator is ≥ 0 so floor == truncate on both engines).

    Two-phase broadcast (the zscore_by_group shape): phase 1 folds
    per-batch per-key Arrow group_by min/max partials through one
    key-scale exchange and collects the groups-scale extrema frame;
    phase 2 broadcasts it (``ray.put``) and scales map-side with a
    sorted-key searchsorted probe — the corpus streams once per phase.
    """
    import ray
    from ray.data.aggregate import Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key),
                      "__v": _to_cents(batch.column(value), cents)})
        agg = t.group_by([key], use_threads=False).aggregate(
            [("__v", "min"), ("__v", "max")])
        return agg.rename_columns([key, "mn", "mx"])

    ext = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key).aggregate(Min("mn"), Max("mx"))
           .to_pandas())  # groups-scale, the stated cardinality bound
    order = np.argsort(ext[key].to_numpy(), kind="mergesort")
    keys = ext[key].to_numpy()[order]
    mns = ext["min(mn)"].to_numpy(dtype=np.int64)[order]
    mxs = ext["max(mx)"].to_numpy(dtype=np.int64)[order]
    ref = ray.put((keys, mns, mxs))

    def apply(batch: pa.Table, ref=None) -> pa.Table:
        ks, mn, mx = ray.get(ref) if not isinstance(ref, tuple) else ref
        v = _to_cents(batch.column(value), cents).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bk = batch.column(key).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, bk)
        span = mx[idx] - mn[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            bp = np.where(span > 0, (v - mn[idx]) * scale
                          // np.maximum(span, 1), 0).astype(np.int64)
        return batch.append_column(out_column, pa.array(bp, pa.int64()))

    return ds.map_batches(apply, fn_kwargs={"ref": ref},
                          batch_format="pyarrow")
