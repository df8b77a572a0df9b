"""Engine configuration.

Mirrors the knobs of the reference (``/root/reference/config.py``) but is
actually wired through (the reference hard-codes the same values at e.g.
``chunking.py:36,116,223,354,390`` — SURVEY.md §3.4). One config object,
passed explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Embedding model registry: name -> dimension.
# Reference: /root/reference/config.py:35-41 and embeddings.py:67-73.
# The real sentence-transformers models are not installed in this
# container; the deterministic hash embedder serves as the default
# backend behind the same API (operators/embedding.py).
EMBEDDING_MODELS: dict[str, int] = {
    "all-MiniLM-L6-v2": 384,
    "all-mpnet-base-v2": 768,
    "e5-base-v2": 768,
    "bge-base-en-v1.5": 768,
    "e5-large-v2": 1024,
}

# Chunking strategy names. Reference: /root/reference/chunking.py:504-512.
CHUNKING_STRATEGIES: tuple[str, ...] = (
    "fixed_size",
    "recursive",
    "structure_aware",
    "hybrid",
    "table_aware",
)


@dataclass
class EngineConfig:
    # Chunking (reference /root/reference/config.py:10-32)
    chunk_size: int = 512          # max tokens per chunk
    chunk_overlap: int = 100       # min overlap tokens carried back (fixed-size)
    min_chunk_size: int = 100      # sections below this merge into previous
    merge_factor: float = 1.5      # merged chunk may reach merge_factor*chunk_size

    # Embedding (reference /root/reference/config.py:44-45)
    batch_size: int = 32
    default_model: str = "all-MiniLM-L6-v2"
    models: dict[str, int] = field(default_factory=lambda: dict(EMBEDDING_MODELS))

    # Retrieval / evaluation (reference /root/reference/config.py:45-54)
    top_k: int = 10
    top_k_accuracy_ks: tuple[int, ...] = (1, 3)
    avg_similarity_k: int = 5
    mrr_cutoff: int = 10

    # Determinism (reference /root/reference/main.py:16-18)
    seed: int = 42

    # Scale knobs (ours; no reference analogue — it is single-process)
    vector_table_partitions: tuple[str, ...] = ("strategy", "model")
    lsh_bucket_length: float = 2.0
    lsh_num_hash_tables: int = 3


DEFAULT_CONFIG = EngineConfig()
