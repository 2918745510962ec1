"""Searchable-text builders.

The reference has TWO distinct text builders (a preserved quirk):

* :func:`build_searchable_text` — the manager path
  (``/root/reference/app/ontology_manager.py:109-144``): config-gated
  name/definition/synonyms concat, optional lowercase / punctuation strip,
  joined with ``preprocessing.combine_fields_separator`` (default ``" | "``).
  Note: includes exact+narrow+broad synonyms but NOT related synonyms.
* :func:`compose_weighted_text` — the DO-embedding path
  (``/root/reference/app/do_embeddings.py:73-145``): labeled sections
  ``Name: ...`` / ``Definition: ...`` / ``Synonyms: <type>: <syn>, ...`` /
  ``References: ...`` (xrefs filtered to prioritized source prefixes,
  capped at 5), weight-gated per field/synonym-type, truncated to
  ``max_text_length`` with a trailing ``"..."``.

(The parser's own third builder — plain space-join — lives in parser.py.)
"""

from __future__ import annotations

import string as _string


def build_searchable_text(term_data: dict, embeddings_config: dict) -> str:
    """Manager-path builder (ontology_manager.py:109-144 parity)."""
    vectorize_fields = embeddings_config.get("vectorize_fields", {})
    preprocessing = embeddings_config.get("preprocessing", {})

    components: list[str] = []

    if vectorize_fields.get("name", True):
        name = term_data.get("name", "")
        if name:
            components.append(name)

    if vectorize_fields.get("definition", True):
        definition = term_data.get("definition", "")
        if definition:
            components.append(definition)

    if vectorize_fields.get("synonyms", True):
        components.extend(term_data.get("exact_synonyms", []) or [])
        components.extend(term_data.get("narrow_synonyms", []) or [])
        components.extend(term_data.get("broad_synonyms", []) or [])

    if preprocessing.get("lowercase", False):
        components = [c.lower() for c in components if c]

    if preprocessing.get("remove_punctuation", False):
        translator = str.maketrans("", "", _string.punctuation)
        components = [c.translate(translator) for c in components if c]

    separator = preprocessing.get("combine_fields_separator", " | ")
    return separator.join(filter(None, components))


def compose_weighted_text(term: dict, embeddings_config: dict) -> str:
    """DO-path weighted composition (do_embeddings.py:73-145 parity).

    ``term`` is an enriched term dict (parser output).  Synonyms are taken
    per-type from the ``{exact,narrow,broad,related}_synonyms`` columns,
    keyed as ``exact_synonym`` etc. to match the reference's DOTerm
    ``synonyms`` dict keys (models.py:30-44 / embeddings_config.yaml:25-29).
    """
    do_cfg = embeddings_config.get("do_specific", {})
    vectorize_fields = embeddings_config.get("vectorize_fields", {})
    text_composition = do_cfg.get("text_composition", {})
    separator = text_composition.get("separator", " | ")
    max_length = text_composition.get("max_text_length", 8000)

    text_parts: list[str] = []

    primary_field = text_composition.get("primary_text", "name")
    name = term.get("name", "")
    if primary_field == "name" and name:
        if vectorize_fields.get("name", 1.0) > 0:
            text_parts.append(f"Name: {name}")

    context_fields = text_composition.get("context_fields", ["definition", "synonyms"])

    definition = term.get("definition", "")
    if "definition" in context_fields and definition:
        if vectorize_fields.get("definition", 0.8) > 0:
            text_parts.append(f"Definition: {definition}")

    synonyms_by_type = {
        "exact_synonym": term.get("exact_synonyms", []) or [],
        "narrow_synonym": term.get("narrow_synonyms", []) or [],
        "broad_synonym": term.get("broad_synonyms", []) or [],
        "related_synonym": term.get("related_synonyms", []) or [],
    }
    if "synonyms" in context_fields and any(synonyms_by_type.values()):
        if vectorize_fields.get("synonyms", 0.6) > 0:
            synonym_types = do_cfg.get("synonym_types", {})
            weighted_synonyms: list[str] = []
            for syn_type, syns in synonyms_by_type.items():
                type_weight = synonym_types.get(syn_type, 0.5)
                if type_weight > 0 and syns:
                    for syn in syns:
                        weighted_synonyms.append(f"{syn_type}: {syn}")
            if weighted_synonyms:
                text_parts.append(f"Synonyms: {', '.join(weighted_synonyms)}")

    xrefs = term.get("cross_references", []) or []
    if "xrefs" in context_fields and xrefs:
        if vectorize_fields.get("xrefs", 0.4) > 0:
            prioritized = do_cfg.get("include_metadata", {}).get("xref_sources", [])
            filtered = []
            for xref in xrefs:
                for source in prioritized:
                    if xref.startswith(source):
                        filtered.append(xref)
                        break
            if filtered:
                text_parts.append(f"References: {', '.join(filtered[:5])}")

    combined = separator.join(text_parts)
    if len(combined) > max_length:
        combined = combined[: max_length - 3] + "..."
    return combined
