"""Deterministic stand-in for the sentence-transformers package, shipped
to Spark executors via ``sc.addPyFile`` in
tests/test_round4.py::test_st_backend_code_path_with_injected_library.

It implements exactly the API surface operators/embedding.py consumes
(``SentenceTransformer(name).encode(texts, batch_size=...,
normalize_embeddings=...)``), so the REAL backend branch — per-partition
model construction, vectorized batch encode, float32 conversion — runs
end to end; only the vendor's actual weights remain untested (they
cannot be installed in this container, README "Environment
constraints")."""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 8  # 8 uint32 lanes == one sha256 digest


class SentenceTransformer:
    def __init__(self, model_name: str):
        self.model_name = model_name

    def encode(self, texts, batch_size: int = 32, normalize_embeddings: bool = False):
        out = np.zeros((len(texts), DIM), dtype=np.float64)
        for i, t in enumerate(texts):
            h = hashlib.sha256(f"{self.model_name}::{t}".encode()).digest()
            vec = np.frombuffer(h[:DIM * 4], dtype=np.uint32).astype(np.float64)
            out[i] = vec - vec.mean()
        if normalize_embeddings:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            out = out / norms
        return out
