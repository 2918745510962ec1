"""Text normalization / cleaning operators.

Standard pre-training curation stages with no reference equivalent
(biocurator_mapper's only text shaping is the " | " searchable-text
join, ``app/go_parser.py`` — covered by ``ontology/text.py``); these
are the general corpus-cleaning forms: canonical whitespace/case
normalization, HTML/markup stripping, URL→domain extraction, and
within-document paragraph dedup.

Exactness contract: every kernel here is a pure Arrow RE2 / vectorized
transform whose DuckDB mirror evaluates the SAME RE2 patterns (both
engines use RE2), so the driver hash check verifies byte-identical
output strings — the same device as ``ops/pii.py``.

Scale notes: all four operators are embarrassingly parallel batch-local
``map_batches`` transforms — no exchange, no driver state, streaming-
safe at any corpus size.  ``domain_counts`` adds one lean
(domain, count) exchange that is distinct-domain-scale, with map-side
partial aggregation so the shuffle never carries corpus rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- case/ws

_WS_RE = r"\s+"


def normalize_text(batch: pa.Table, text_column: str = "text",
                   out_column: str = "text_norm") -> pa.Table:
    """Lowercase, collapse every whitespace run to one space, trim.

    Oracle: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))`` —
    after the collapse, edges are plain spaces, so ASCII ``trim`` and
    Arrow's unicode trim agree.
    """
    x = pc.utf8_lower(batch.column(text_column))
    x = pc.replace_substring_regex(x, _WS_RE, " ")
    x = pc.utf8_trim_whitespace(x)
    return batch.append_column(out_column, x)


# ---------------------------------------------------------------- markup

# literal entity unescapes, FIXED order with &amp; last (a single
# unescape pass, not a recursive one — '&amp;lt;' becomes '&lt;', never
# '<'; both sides apply the same ordered chain so outputs are identical)
ENTITY_MAP: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_TAG_RE = r"<[^>]*>"


def strip_markup(batch: pa.Table, text_column: str = "text",
                 out_column: str = "text_plain") -> pa.Table:
    """Drop ``<...>`` tags (replaced by one space, so adjacent words
    don't fuse), unescape the five standard entities in fixed order,
    collapse whitespace, trim."""
    x = pc.replace_substring_regex(batch.column(text_column), _TAG_RE, " ")
    for ent, ch in ENTITY_MAP:
        x = pc.replace_substring(x, ent, ch)
    x = pc.replace_substring_regex(x, _WS_RE, " ")
    x = pc.utf8_trim_whitespace(x)
    return batch.append_column(out_column, x)


# ---------------------------------------------------------------- urls

URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def extract_domain(batch: pa.Table, text_column: str = "text",
                   out_column: str = "domain") -> pa.Table:
    """Domain of the FIRST URL in each document ('' when none — matches
    DuckDB ``regexp_extract``'s no-match value so the hash check can
    compare the column directly)."""
    m = pc.extract_regex(batch.column(text_column),
                         r"https?://(?P<d>[A-Za-z0-9.-]+)")
    dom = pc.coalesce(pc.struct_field(m, "d"), pa.scalar("", pa.string()))
    return batch.append_column(out_column, dom)


def domain_counts(ds, *, text_column: str = "text"):
    """Documents per first-URL domain, docs without a URL excluded.

    Map-side partial count per batch, then a distinct-domain-scale
    ``groupby().sum()`` — the exchange never carries document rows.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = extract_domain(batch, text_column)
        df = (t.select(["domain"]).to_pandas().value_counts("domain")
              .reset_index(name="n_docs"))
        df = df[df["domain"] != ""]
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "domain").sum("n_docs")
    return out.map_batches(
        lambda t: t.rename_columns(["domain", "n_docs"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------- paras

def dedup_paragraphs(batch: pa.Table, text_column: str = "text",
                     out_column: str = "text_dedup",
                     sep: str = "\n") -> pa.Table:
    """Remove duplicate paragraphs WITHIN each document, preserving
    first-occurrence order (the classic within-page boilerplate pass).

    Fully vectorized: split → explode via offsets → first-occurrence
    mask (hash-based ``duplicated`` over (row, paragraph)) → rebuild the
    list array from the kept mask → ``binary_join``.  No Python loop.
    """
    col = batch.column(text_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    split = pc.split_pattern(col, sep)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offsets = split.offsets.to_numpy()
    counts = np.diff(offsets)
    values = split.values
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    dup = pd.DataFrame({
        "r": row_idx,
        "p": values.to_pandas().to_numpy(),
    }).duplicated(["r", "p"]).to_numpy()
    keep = ~dup
    new_counts = np.bincount(row_idx[keep], minlength=len(counts))
    new_offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    kept_values = values.filter(pa.array(keep))
    if new_offsets[-1] < 2**31:
        lst = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_values)
    else:  # 64-bit offset spill, same guard as ops/pack.chunk_spans
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, pa.int64()), kept_values)
    joined = pc.binary_join(lst, sep)
    return batch.append_column(out_column, joined)


def json_field(batch: pa.Table, *, column: str, path: str,
               out_column: str | None = None) -> pa.Table:
    """Extract a JSON path from a string column as text (semi-structured
    log/event parsing): appends ``out_column`` (default ``column_path``)
    with ``json_extract_string`` semantics — nested paths like
    ``$.a.b`` supported, malformed JSON and missing fields → null.

    Vectorized through the process-global DuckDB kernel (same device as
    the md5 kernels in functions/hashing.py — one C call per batch, no
    per-row Python); byte-identical to the SQL oracle expression
    ``CASE WHEN json_valid(s) THEN json_extract_string(s, path) END``.
    """
    from biocurator_mapper_ray.functions.hashing import _duck

    if out_column is None:
        out_column = f"{column}_{path.strip('$.').replace('.', '_')}"
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tbl = pa.table({"s": col})  # noqa: F841 (duckdb scan)
    lit = path.replace("'", "''")
    out = _duck().execute(
        f"SELECT CASE WHEN s IS NOT NULL AND json_valid(s) "
        f"THEN json_extract_string(s, '{lit}') END AS v FROM tbl"
    ).arrow()
    return batch.append_column(out_column, out.column("v").combine_chunks())


def regex_extract(batch: pa.Table, *, column: str, pattern: str,
                  group: int = 1, out_column: str | None = None) -> pa.Table:
    """Extract a regex capture group from a string column (structured
    field pull from logs/markup — the regex sibling of
    :func:`json_field`): appends ``out_column`` (default
    ``column_re``) with the ``group``-th capture of the FIRST match;
    no match (or null input) → null.

    Vectorized through the process-global DuckDB kernel — one C call
    per batch, RE2 semantics, byte-identical to the SQL oracle
    expression ``CASE WHEN regexp_matches(s, pat) THEN
    regexp_extract(s, pat, group) END`` because it IS that expression.
    """
    from biocurator_mapper_ray.functions.hashing import _duck

    if out_column is None:
        out_column = f"{column}_re"
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tbl = pa.table({"s": col})  # noqa: F841 (duckdb scan)
    lit = pattern.replace("'", "''")
    out = _duck().execute(
        f"SELECT CASE WHEN s IS NOT NULL AND regexp_matches(s, '{lit}') "
        f"THEN regexp_extract(s, '{lit}', {int(group)}) END AS v FROM tbl"
    ).arrow()
    return batch.append_column(out_column, out.column("v").combine_chunks())


def unicode_nfc(batch: pa.Table, *, column: str,
                out_column: str | None = None) -> pa.Table:
    """Unicode NFC canonical composition of a string column — the
    normalization multilingual corpora need BEFORE any hash-based dedup
    (the same text with composed vs combining accents must hash equal).
    Appends ``out_column`` (default ``column_nfc``).

    Vectorized through the process-global DuckDB kernel (the
    :func:`json_field` device — one C call per batch, no per-row
    Python); byte-identical to the SQL oracle expression
    ``nfc_normalize(s)`` because it IS that expression.  Nulls pass
    through.
    """
    from biocurator_mapper_ray.functions.hashing import _duck

    if out_column is None:
        out_column = f"{column}_nfc"
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tbl = pa.table({"s": col})  # noqa: F841 (duckdb scan)
    out = _duck().execute(
        "SELECT nfc_normalize(s) AS v FROM tbl").arrow()
    return batch.append_column(out_column, out.column("v").combine_chunks())


def strip_accents(batch: pa.Table, *, column: str,
                  out_column: str | None = None) -> pa.Table:
    """Accent/diacritic removal (the search-normalization step next to
    lowercasing: 'café' → 'cafe'): appends ``out_column`` (default
    ``column_ascii``).

    Vectorized through the process-global DuckDB kernel (the
    :func:`unicode_nfc` device — one C call per batch); byte-identical
    to the SQL oracle ``strip_accents(s)`` because it IS that
    expression.  Nulls pass through."""
    from biocurator_mapper_ray.functions.hashing import _duck

    if out_column is None:
        out_column = f"{column}_ascii"
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tbl = pa.table({"s": col})  # noqa: F841 (duckdb scan)
    out = _duck().execute(
        "SELECT strip_accents(s) AS v FROM tbl").arrow()
    return batch.append_column(out_column, out.column("v").combine_chunks())


# ---------------------------------------------------------------- URLs

_URL_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                 r"(?P<hostport>[^/?#]+)"
                 r"(?P<path>[^?#]*)[?]?(?P<query>[^#]*)(?:#.*)?$")
_HOSTPORT_RE = r"^(?P<host>[^:]*?)(?P<colon>:?)(?P<port>[0-9]*)$"
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")


def canonicalize_url(batch: pa.Table, *, column: str = "url",
                     out_column: str = "url_canon",
                     tracking_prefixes=_TRACKING_PREFIXES) -> pa.Table:
    """Canonical URL form — the normalization web-crawl curation needs
    before URL-keyed dedup/grouping (the same page crawled as
    ``HTTP://Site.COM:80/p?b=2&utm_source=x&a=1#top`` and
    ``http://site.com/p?a=1&b=2`` must compare equal):

    * scheme and host lowercased (path/query case is significant, kept)
    * default port dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept
    * fragment dropped
    * tracking query params removed (``utm_*``, ``gclid``, ``fbclid``)
    * remaining query params sorted bytewise; ``?`` dropped when none
      survive
    * empty path → ``/`` (so ``http://h.com`` ≡ ``http://h.com/``)

    Strings that don't parse as absolute http(s)-style URLs pass
    through as ``''``.  Appends ``out_column``.

    Fully vectorized: Arrow RE2 part extraction + a flatten /
    ``np.lexsort`` / offset-rebuild pass for the per-URL param sort —
    no per-row Python, batch-local, no exchange.
    """
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    parts = pc.extract_regex(col, _URL_PARTS_RE)
    empty = pa.scalar("", pa.string())
    scheme = pc.utf8_lower(
        pc.coalesce(pc.struct_field(parts, "scheme"), empty))
    hostport = pc.coalesce(pc.struct_field(parts, "hostport"), empty)
    path = pc.coalesce(pc.struct_field(parts, "path"), empty)
    query = pc.coalesce(pc.struct_field(parts, "query"), empty)

    hp = pc.extract_regex(hostport, _HOSTPORT_RE)
    host = pc.utf8_lower(pc.coalesce(pc.struct_field(hp, "host"), empty))
    port = pc.coalesce(pc.struct_field(hp, "port"), empty)

    # default-port drop: port suffix kept only when non-empty and not
    # the scheme's default
    scheme_np = np.asarray(scheme, dtype=object).astype(str)
    port_np = np.asarray(port, dtype=object).astype(str)
    defaults = np.where(scheme_np == "http", "80",
                        np.where(scheme_np == "https", "443", ""))
    keep_port = (port_np != "") & (port_np != defaults)
    port_sfx = np.where(keep_port, np.char.add(":", port_np), "")

    # query params: split on '&', drop tracking params, sort the rest
    # within each URL (flatten → lexsort(parent, value) → rebuild)
    params = pc.split_pattern(query, "&")
    flat = np.asarray(params.flatten(), dtype=object).astype(str)
    counts = np.asarray(pc.list_value_length(params), dtype=np.int64)
    parents = np.repeat(np.arange(n, dtype=np.int64), counts)
    keep = flat != ""
    for pref in tracking_prefixes:
        keep &= ~np.char.startswith(flat, pref)
    flat, parents = flat[keep], parents[keep]
    order = np.lexsort((flat, parents))
    flat, parents = flat[order], parents[order]
    kept_counts = np.bincount(parents, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    # mirror pack.py's guard: spill to 64-bit offsets past 2^31 params
    if offsets[-1] < 2**31:
        sorted_params = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.string()))
    else:
        sorted_params = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(flat, pa.large_string()))
    qs = pc.binary_join(sorted_params, "&")
    qs_np = np.asarray(qs, dtype=object).astype(str)
    q_sfx = np.where(qs_np != "", np.char.add("?", qs_np), "")

    path_np = np.asarray(path, dtype=object)
    path_np = np.where(path_np == "", "/", path_np).astype(str)

    host_np = np.asarray(host, dtype=object).astype(str)
    canon = np.where(
        host_np == "", "",
        np.char.add(np.char.add(np.char.add(np.char.add(
            np.char.add(scheme_np, "://"), host_np),
            port_sfx.astype(str)), path_np), q_sfx.astype(str)))
    return batch.append_column(out_column,
                               pa.array(canon.tolist(), pa.string()))


def path_prefix_rollup(ds, *, url_column: str = "url",
                       max_depth: int = 3):
    """URL path-hierarchy rollup: document counts per host and per
    path prefix down to ``max_depth`` segments — the crawl-structure
    profile (which hosts dominate, which sections of a host are deep)
    read before per-domain quotas or path-level blocklists are set.

    Per batch: Arrow RE2 part extraction (the
    :func:`canonicalize_url` regexes), path-segment flatten with empty
    segments masked out, and per-level prefix extension via direct
    d-th-segment gather — then an IN-BATCH (depth, prefix) count
    pre-aggregation, so the single exchange ships
    distinct-prefix-scale rows, never document-scale.  Rows that don't
    parse as absolute URLs contribute nothing.

    Returns ``(depth:int64, prefix:string, n_docs:int64)`` — depth 0
    is the bare lowercased host, depth d appends the first d non-empty
    path segments joined with ``/``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(url_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        empty = pa.scalar("", pa.string())
        parts = pc.extract_regex(col, _URL_PARTS_RE)
        hostport = pc.coalesce(pc.struct_field(parts, "hostport"), empty)
        path = pc.coalesce(pc.struct_field(parts, "path"), empty)
        hp = pc.extract_regex(hostport, _HOSTPORT_RE)
        host = pc.utf8_lower(
            pc.coalesce(pc.struct_field(hp, "host"), empty))
        host_np = np.asarray(host.to_numpy(zero_copy_only=False),
                             dtype=object)
        ok = host_np != ""

        segs_list = pc.split_pattern(path, "/")
        flat = np.asarray(segs_list.flatten(), dtype=object)
        counts = np.asarray(pc.list_value_length(
            pc.fill_null(segs_list, [])), dtype=np.int64)
        parents = np.repeat(np.arange(len(host_np)), counts)
        keep = (flat != "")
        flat, parents = flat[keep], parents[keep]
        nseg = np.bincount(parents, minlength=len(host_np))
        starts = np.concatenate(([0], np.cumsum(nseg)[:-1]))

        out_depth, out_prefix = [], []
        # object array: per-level prefix growth must never hit a
        # fixed-width unicode truncation
        cur = host_np.copy()
        alive = np.flatnonzero(ok)
        out_depth.append(np.zeros(len(alive), np.int64))
        out_prefix.append(cur[alive].astype(object))
        for d in range(1, max_depth + 1):
            alive = alive[nseg[alive] >= d]
            if not len(alive):
                break
            segd = flat[starts[alive] + d - 1].astype(str)
            cur_alive = np.char.add(np.char.add(
                cur[alive].astype(str), "/"), segd)
            cur[alive] = cur_alive.astype(object)
            out_depth.append(np.full(len(alive), d, np.int64))
            out_prefix.append(cur_alive.astype(object))

        t = pa.table({
            "depth": pa.array(np.concatenate(out_depth), pa.int64()),
            "prefix": pa.array(np.concatenate(out_prefix).tolist(),
                               pa.string())})
        g = t.group_by(["depth", "prefix"]).aggregate([([], "count_all")])
        return g.rename_columns(["depth", "prefix", "n_docs"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["depth", "prefix"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))


def json_schema_profile(ds, *, column: str):
    """Semi-structured schema discovery: for every TOP-LEVEL key in a
    JSON string column, how many rows carry it and as what JSON type —
    the first-contact profile of an events/props payload before any
    extraction paths are written (``json_field`` is the extractor;
    this op tells you which paths exist and whether a key is
    type-stable).  Returns ``(key, json_type, n_rows)``.

    Per batch ONE DuckDB kernel call (``json_keys`` unnest +
    ``json_type`` + in-batch GROUP BY — the md5-kernel convention of
    functions/hashing), so the exchange ships distinct
    (key, type)-scale partials, never rows.  Dotted/quoted key names
    would need escaped paths (``json_type`` is probed via
    ``'$.' || key``); invalid JSON rows contribute nothing.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import _duck

    def partial(batch: pa.Table) -> pa.Table:
        tbl = pa.table({"s": pc.fill_null(  # noqa: F841 (duckdb scan)
            batch.column(column).cast(pa.string()), "")})
        out = _duck().execute("""
            SELECT k AS key,
                   json_type(json_extract(s, '$.' || k)) AS json_type,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM (SELECT s, unnest(json_keys(s)) AS k
                  FROM tbl WHERE json_valid(s))
            GROUP BY 1, 2
        """).arrow()
        return out.cast(pa.schema([("key", pa.string()),
                                   ("json_type", pa.string()),
                                   ("n_rows", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["key", "json_type"])
            .aggregate(Sum("n_rows", alias_name="n_rows")))
