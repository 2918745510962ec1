"""PII detection / redaction over a text column.

A standard pre-training curation stage (see e.g. BigScience ROOTS /
Dolma — public pipelines): find emails, phone numbers and IPv4
addresses, count them per document, and replace each with a typed
placeholder token.

Exactness contract: both the engine and the DuckDB oracle evaluate the
SAME RE2 patterns — Arrow's ``replace_substring_regex`` /
``count_substring_regex`` and DuckDB's ``regexp_replace`` /
``regexp_extract_all`` are both RE2, so the redacted strings are
byte-identical and the driver hash check verifies true regex parity
(not just row counts).  Patterns are applied in a FIXED order (email →
phone → ipv4) and counts are taken on the ORIGINAL text independently
per pattern.

The test corpus contains no organic PII, so the driver query
(``pii_scrub_documents``) plants deterministic synthetic PII derived
from ``doc_id`` on BOTH sides before scrubbing — same device as
``decontam_documents``' synthetic benchmark subset.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters and is part of the op
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def pii_scrub(batch: pa.Table, text_column: str = "text",
              out_column: str = "text_clean") -> pa.Table:
    """Append per-pattern match counts (``n_email`` / ``n_phone`` /
    ``n_ipv4``, int64, counted on the original text) and the redacted
    text (patterns replaced in order).  Pure Arrow RE2 kernels — no
    Python loop."""
    text = batch.column(text_column)
    clean = text
    for name, pattern, repl in PII_PATTERNS:
        batch = batch.append_column(
            f"n_{name}",
            pc.cast(pc.count_substring_regex(text, pattern), pa.int64()),
        )
        clean = pc.replace_substring_regex(clean, pattern, repl)
    return batch.append_column(out_column, clean)
