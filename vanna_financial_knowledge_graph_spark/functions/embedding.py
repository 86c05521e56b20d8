"""Deterministic feature-hash text embeddings (SURVEY.md U3/U4).

The reference embeds chunks/entities/facts/topics with a model and stores
the vectors alongside the rows (storage/lancedb/indices.py:21-26,102-136;
dim at indices.py:37). This rebuild replaces the model with the classic
feature-hashing trick (Weinberger et al., ICML'09): each token hashes to a
(dimension, sign) pair via crc32, token counts accumulate signed, and the
vector is L2-normalized. Pure, deterministic across processes (crc32, not
Python's seeded hash()), and fast (C-speed hashing, NumPy accumulation) —
so the single-node oracle and the Arrow-batched executors agree exactly,
and resume/byte-identity contracts extend to the vector tables.

Swap `embed_text`/`embed_batch` for a real model encoder at deployment; the
Spark-side plumbing (operators/embed.py) is shape-identical either way.
"""

from __future__ import annotations

import zlib

import numpy as np

EMBED_DIM = 64


def _accumulate(text: str, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").lower().split():
        h = zlib.crc32(tok.encode("utf-8"))
        # low bits pick the dimension, an independent bit picks the sign
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    return v


def embed_text(text: str, dim: int = EMBED_DIM) -> list[float]:
    """One L2-normalized feature-hash vector (U4 single-text surface)."""
    v = _accumulate(text, dim)
    n = float(np.linalg.norm(v))
    if n > 0.0:
        v = v / n
    return [float(x) for x in v.astype(np.float32)]


def embed_batch(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Batched embedding (U3): (len(texts), dim) float32, rows L2-normalized.
    Zero vectors (empty/whitespace text) stay zero.

    Vectorized: tokens across the whole batch are factorized so crc32 runs
    once per UNIQUE token (Zipf: a tiny fraction of occurrences), then one
    NumPy scatter-add builds every row. Identical output to embed_text per
    row (tests/test_embed.py::test_embed_batch_matches_single)."""
    import itertools

    import pandas as pd

    n = len(texts)
    tok_lists = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    out = np.zeros((n, dim), dtype=np.float64)
    if total:
        all_toks = np.fromiter(
            itertools.chain.from_iterable(tok_lists), dtype=object, count=total
        )
        codes, uniques = pd.factorize(all_toks)
        u_idx = np.empty(len(uniques), dtype=np.int64)
        u_sign = np.empty(len(uniques), dtype=np.float64)
        for i, tok in enumerate(uniques):
            h = zlib.crc32(tok.encode("utf-8"))
            u_idx[i] = h % dim
            u_sign[i] = 1.0 if (h >> 16) & 1 else -1.0
        rows = np.repeat(np.arange(n), lens)
        np.add.at(out, (rows, u_idx[codes]), u_sign[codes])
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0.0)
    return out.astype(np.float32)
