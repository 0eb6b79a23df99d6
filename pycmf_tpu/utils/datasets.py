"""Datasets for benchmarks/examples (SURVEY.md §0 flagship use case).

The real 20 Newsgroups corpus needs network access to download, which this
environment doesn't have; ``load_20ng`` uses a cached sklearn copy when one
exists and otherwise falls back to ``synthetic_20ng`` — a corpus-shaped
surrogate matching 20NG's documented statistics (11314 train docs, ~30k
vocab at max_features, Zipfian term frequencies, ~0.1-0.3% density,
20 balanced-ish labels). Benchmarks label which one they used.

Orientation: the CMF contract couples X's columns with Y's rows through the
shared V (X ≈ f(UVᵀ), Y ≈ f(VZᵀ); SURVEY.md §0). For supervised topics the
shared dimension must be documents, so X is TERM×DOCUMENT and Y is
DOCUMENT×LABEL one-hot; U then holds term-topic weights (what
print_topic_terms reads) and V holds document-topic weights.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp


def synthetic_20ng(n_docs: int = 11314, n_terms: int = 30000,
                   n_labels: int = 20, n_topics: int = 40,
                   avg_doc_len: int = 120, random_state: int = 0,
                   dtype=np.float32):
    """20NG-shaped synthetic bag-of-words: (X term×doc CSR, Y doc×label)."""
    rng = np.random.RandomState(random_state)
    # Zipfian term distribution per topic
    base = 1.0 / np.arange(1, n_terms + 1) ** 1.1
    topic_term = np.stack([
        base[rng.permutation(n_terms)] for _ in range(n_topics)])
    topic_term /= topic_term.sum(axis=1, keepdims=True)
    doc_topic = rng.dirichlet(np.full(n_topics, 0.1), size=n_docs)
    labels = doc_topic.argmax(axis=1) % n_labels

    rows, cols, vals = [], [], []
    doc_lens = rng.poisson(avg_doc_len, size=n_docs).clip(10)
    for d in range(n_docs):
        # mixture sampling of terms for one document
        t = rng.choice(n_topics, p=doc_topic[d])
        terms = rng.choice(n_terms, size=doc_lens[d], p=topic_term[t])
        uterms, counts = np.unique(terms, return_counts=True)
        rows.append(uterms)
        cols.append(np.full(uterms.shape, d, dtype=np.int64))
        vals.append(counts.astype(dtype))
    X = sp.csr_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_terms, n_docs), dtype=dtype)
    Y = np.zeros((n_docs, n_labels), dtype=dtype)
    Y[np.arange(n_docs), labels] = 1.0
    return X, Y


def _fetch_20ng(download: bool):
    from sklearn.datasets import fetch_20newsgroups

    return fetch_20newsgroups(subset="train", download_if_missing=download,
                              remove=("headers", "footers", "quotes"))


def load_20ng(max_features: int = 30000, random_state: int = 0,
              dtype=np.float32) -> Tuple[sp.csr_matrix, np.ndarray, str]:
    """(X term×doc CSR, Y doc×label one-hot, source) — real when possible.

    Resolution order (VERDICT r03 next #6 — population day needs no code):
    1. sklearn's on-disk 20NG cache (no network);
    2. a live sklearn download, bounded by a 30 s socket timeout so the
       no-network environment fails fast instead of hanging
       (PYCMF_NO_DOWNLOAD=1 skips the attempt entirely);
    3. the synthetic 20NG-shaped surrogate, with the fallback reason in the
       returned source string (bench.py logs it and ships it in the JSON).
    """
    import os
    import socket

    try:
        data = _fetch_20ng(download=False)
        source = "20newsgroups (sklearn cache)"
    except Exception:
        data = None
        if os.environ.get("PYCMF_NO_DOWNLOAD", "0") == "1":
            reason = "download disabled"
        else:
            prev = socket.getdefaulttimeout()
            socket.setdefaulttimeout(30.0)
            try:
                data = _fetch_20ng(download=True)
                source = "20newsgroups (sklearn download)"
                reason = ""
            except Exception as e:
                reason = f"download failed: {type(e).__name__}"
            finally:
                socket.setdefaulttimeout(prev)
    if data is None:
        X, Y = synthetic_20ng(random_state=random_state, dtype=dtype)
        return X, Y, f"synthetic 20NG-shaped surrogate ({reason})"

    from sklearn.feature_extraction.text import CountVectorizer

    vec = CountVectorizer(max_features=max_features, dtype=np.float64)
    Xdw = vec.fit_transform(data.data)          # doc × word
    X = sp.csr_matrix(Xdw.T, dtype=dtype)       # term × doc
    n_labels = int(np.max(data.target)) + 1
    Y = np.zeros((X.shape[1], n_labels), dtype=dtype)
    Y[np.arange(X.shape[1]), data.target] = 1.0
    return X, Y, source
