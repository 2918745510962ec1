"""biocurator_mapper_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of
alliance-genome/biocurator_mapper (reference at /root/reference, cited by
file:line throughout) as streaming ``ray.data.Dataset`` pipelines:

* ``ontology``  — OBO-graph JSON parsing into enriched term records
  (reference: ``app/go_parser.py``), quality filters and weighted text
  composition (``app/do_embeddings.py``), snapshot versioning
  (``app/ontology_version_manager.py``).
* ``functions`` — deterministic, vectorized kernels: feature-hash embedder,
  text statistics (lang-id, quality scores, token counts, fingerprints).
* ``state``     — broadcastable vector index (replaces Weaviate,
  ``app/ontology_searcher.py``) and run manifests / stage checkpoints
  (``app/config_updater.py``, ``app/ontology_version_manager.py``).
* ``stages``    — actor-pool map_batches stages: embed, mention-detect,
  retrieve (top-k), score/select (``app/llm_matcher.py`` selection
  contract), canonicalize.
* ``sources``   — ontology JSON reader and the deterministic transcript
  synthesizer (north-rule input shape).
* ``pipelines`` — end-to-end flows: ontology → term-vector index build and
  transcripts → deduplicated (subj, pred, obj) triples.
* ``ops``       — large-scale training-data operators: exact / MinHash-LSH /
  SimHash dedup, similarity search, text analysis, multimodal stubs.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "bmr-0.1.0"
