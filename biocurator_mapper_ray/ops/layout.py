"""Physical-layout operators: Z-order (Morton) clustering keys.

No reference equivalent (biocurator_mapper stores everything in a
vector DB); this is the lakehouse data-layout primitive: interleaving
the bits of k low-cardinality-bounded integer dimensions gives a single
sort key whose ranges are axis-aligned hyper-rectangles, so ONE
``sort(zkey)`` (or a range repartition on it) co-locates rows that are
close in EVERY dimension at once.  Downstream multi-column range scans
then prune whole files/row-groups via parquet min/max stats on the key
columns — the standard OPTIMIZE ZORDER BY story, expressed as plain
Ray Data ``sort`` + partitioned ``write_parquet``.

Scale shape: the key is a pure per-row vectorized map (no exchange);
the clustering itself is one range-partition sort — the single
all-to-all this op exists to amortize, paid once at write time to make
every later scan selective.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def morton_interleave(cols: list[np.ndarray], bits: int) -> np.ndarray:
    """Bit-interleave the low ``bits`` bits of k non-negative integer
    arrays into one int64 z-value.  Bit layout: value bit ``i`` of
    column ``j`` lands at position ``i*k + (k-1-j)`` — column 0 is the
    most significant dimension inside each bit group (SQL mirror for
    k=2: ``sum((((x>>i)&1)*2 + ((y>>i)&1)) << (2*i))``).

    ``k*bits`` must stay ≤ 63; inputs are masked to ``bits`` bits, so
    callers bucket/quantize wider dimensions first (quantile-bucketed
    dims spread skew better than raw values).
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds int64")
    out = np.zeros(len(cols[0]), dtype=np.int64)
    mask = (np.int64(1) << np.int64(bits)) - np.int64(1)
    for j, c in enumerate(cols):
        c = c.astype(np.int64) & mask
        for i in range(bits):
            out |= ((c >> np.int64(i)) & np.int64(1)) << np.int64(
                i * k + (k - 1 - j))
    return out


def zorder_key(ds, *, cols: list[str], bits: int = 16, out: str = "zkey"):
    """Append the Morton key of ``cols`` (masked to ``bits`` bits each)
    as column ``out`` — a per-row vectorized map_batches, no exchange."""

    def add(batch: pa.Table) -> pa.Table:
        arrs = [batch.column(c).to_numpy(zero_copy_only=False)
                for c in cols]
        z = morton_interleave(arrs, bits) if len(batch) else \
            np.zeros(0, dtype=np.int64)
        return batch.append_column(out, pa.array(z, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def zorder_cluster(ds, *, cols: list[str], bits: int = 16,
                   out: str = "zkey"):
    """Z-order clustering: key + ONE range-partition sort on it.  Write
    the result with ``write_parquet`` and later multi-column range
    scans prune on per-file min/max of the original columns."""
    return zorder_key(ds, cols=cols, bits=bits, out=out).sort(out)
