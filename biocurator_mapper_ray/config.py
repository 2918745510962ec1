"""Engine configuration.

Mirrors the reference's two YAML config surfaces (ontology_config.yaml and
embeddings_config.yaml — reference loads them at ``app/config.py:24-73``)
as plain-dict defaults that can be overridden from a YAML file.  All knobs
the reference exposes are kept, plus the Ray-execution knobs (batch sizes,
actor-pool sizes, embedding dims) that replace its request/response runtime.
"""

from __future__ import annotations

import copy
import os
from typing import Any

# Default k for candidate retrieval (reference: app/config.py:10).
DEFAULT_K = 5

# Deterministic embedder dims — small for tests; the reference uses 1536
# (embeddings_config.yaml:7) against OpenAI; ours is pluggable.
DEFAULT_EMBED_DIM = 256

DEFAULT_ONTOLOGY_CONFIG: dict[str, Any] = {
    # reference: ontology_config.yaml:1-20
    "ontologies": {
        "GO": {
            "name": "Gene Ontology",
            "id_format": {"separator": ":", "prefix_replacement": {"_": ":"}},
            "enabled": True,
        },
        "DOID": {
            "name": "Disease Ontology",
            "id_format": {"separator": ":", "prefix_replacement": {"_": ":"}},
            "enabled": True,
        },
    },
    "settings": {
        "default_k": DEFAULT_K,
        # reference: ontology_config.yaml:32-38 — pluggable JSON source shape
        "json_parsing": {
            "graphs_key": "graphs",
            "nodes_key": "nodes",
            "id_key": "id",
            "label_key": "lbl",
            "definition_path": ["meta", "definition", "val"],
        },
    },
}

DEFAULT_EMBEDDINGS_CONFIG: dict[str, Any] = {
    # reference: embeddings_config.yaml — same keys, deterministic model
    "model": {"name": "hashing-v1", "dimensions": DEFAULT_EMBED_DIM},
    "processing": {
        "batch_size": 1024,
        "retry_failed": True,
        "max_retries": 3,
    },
    "vectorize_fields": {"name": 1.0, "definition": 0.8, "synonyms": 0.6, "xrefs": 0.4},
    "do_specific": {
        "synonym_types": {
            "exact_synonym": 1.0,
            "narrow_synonym": 0.8,
            "broad_synonym": 0.7,
            "related_synonym": 0.5,
        },
        "include_metadata": {
            "xref_sources": ["MESH", "ICD10CM", "SNOMEDCT", "OMIM"],
            "definition_required": True,
            "include_obsolete": False,
        },
        "text_composition": {
            "primary_text": "name",
            "context_fields": ["definition", "synonyms"],
            "separator": " | ",
            "max_text_length": 8000,
        },
        "quality_filters": {
            "min_definition_length": 10,
            "exclude_patterns": ["deprecated", "obsolete"],
        },
    },
    "preprocessing": {
        "lowercase": False,
        "remove_punctuation": False,
        "combine_fields_separator": " | ",
    },
}

# Ray-execution knobs (new — no reference equivalent; the reference is a
# sequential single-process loop, app/ontology_manager.py:337-338).
DEFAULT_EXECUTION_CONFIG: dict[str, Any] = {
    "embed_batch_size": 4096,
    "link_batch_size": 2048,
    "actor_concurrency": 4,          # actors per stateful stage (scaled by bench)
    "confidence_threshold": 0.5,     # accept threshold for link decisions
    "retrieval_k": DEFAULT_K,
    "salt_buckets": 16,              # salted-split fanout for mega-conversations
    "salt_threshold_turns": 10_000,  # conv size above which salting matters
}


def _deep_update(base: dict, override: dict) -> dict:
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


class EngineConfig:
    """Merged view over the three config surfaces with YAML override support."""

    def __init__(
        self,
        ontology: dict | None = None,
        embeddings: dict | None = None,
        execution: dict | None = None,
    ):
        self.ontology = _deep_update(copy.deepcopy(DEFAULT_ONTOLOGY_CONFIG), ontology or {})
        self.embeddings = _deep_update(copy.deepcopy(DEFAULT_EMBEDDINGS_CONFIG), embeddings or {})
        self.execution = _deep_update(copy.deepcopy(DEFAULT_EXECUTION_CONFIG), execution or {})

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = cls(
            ontology=data.get("ontology"),
            embeddings=data.get("embeddings"),
            execution=data.get("execution"),
        )
        cfg.source_path = path
        return cfg

    source_path: str | None = None

    def reload(self) -> dict:
        """Re-read the YAML this config came from and swap the surfaces
        in place (reference parity: ``POST /admin/reload_config``,
        ``/root/reference/app/main.py:416-434`` — re-loads ontology +
        embeddings config mid-run and reports what is now active).

        In-place mutation means long-lived drivers holding this object
        see the new values on the next stage they build; actor pools
        constructed earlier keep their captured state (same as the
        reference, where running jobs keep their snapshot).  Returns the
        reference-shaped status payload."""
        if not self.source_path:
            return {"status": "error", "message": "config has no source file"}
        try:
            fresh = EngineConfig.from_yaml(self.source_path)
        except Exception as e:
            return {"status": "error", "message": f"Failed to reload config: {e}"}
        self.ontology = fresh.ontology
        self.embeddings = fresh.embeddings
        self.execution = fresh.execution
        return {
            "status": "success",
            "message": "Configuration reloaded successfully",
            "ontologies": list(self.ontology.get("ontologies", {}).keys()),
            "embedding_model": self.embeddings.get("model", {}).get("name"),
        }

    def id_format(self, ontology_name: str) -> dict:
        ont = self.ontology["ontologies"].get(ontology_name, {})
        return ont.get("id_format", {"prefix_replacement": {"_": ":"}})


def default_config() -> EngineConfig:
    return EngineConfig()


def testdata_dir(sf: str = "0.001") -> str:
    return os.environ.get("GRAFT_SF_DIR", f"/root/testdata/sf{sf}")
