from .parser import (
    extract_synonyms_from_node,
    extract_cross_references,
    get_ontology_namespace,
    get_nested_value,
    parse_enhanced_term,
    parse_ontology_json,
    parse_nodes_batch,
    TERM_SCHEMA,
)
from .quality import meets_quality_filters, filter_terms_batch
from .text import build_searchable_text, compose_weighted_text
from .versioning import compute_version_hash, extract_version_info, needs_update

__all__ = [
    "extract_synonyms_from_node",
    "extract_cross_references",
    "get_ontology_namespace",
    "get_nested_value",
    "parse_enhanced_term",
    "parse_ontology_json",
    "parse_nodes_batch",
    "TERM_SCHEMA",
    "meets_quality_filters",
    "filter_terms_batch",
    "build_searchable_text",
    "compose_weighted_text",
    "compute_version_hash",
    "extract_version_info",
    "needs_update",
]
