"""Topic/factor inspection helpers (SURVEY.md §2 component 5, §3.5).

The reference ships small analysis utilities that print the top-weighted
terms per component of a fitted factor given a vectorizer vocabulary. These
are host-side NumPy — nothing here touches the device.
"""
from __future__ import annotations

from typing import List

import numpy as np


def _resolve_vocab(vectorizer=None, vocabulary=None, size: int = 0):
    if vocabulary is not None:
        if isinstance(vocabulary, dict):  # token -> index mapping
            inv = [None] * (max(vocabulary.values()) + 1)
            for tok, idx in vocabulary.items():
                inv[idx] = tok
            return inv
        return list(vocabulary)
    if vectorizer is not None:
        if hasattr(vectorizer, "get_feature_names_out"):
            return list(vectorizer.get_feature_names_out())
        if hasattr(vectorizer, "get_feature_names"):
            return list(vectorizer.get_feature_names())
        if hasattr(vectorizer, "vocabulary_"):
            return _resolve_vocab(vocabulary=vectorizer.vocabulary_)
    return [f"feat_{i}" for i in range(size)]


def top_terms_per_component(M: np.ndarray, n_top: int = 10) -> np.ndarray:
    """Indices of the n_top largest-weight rows for each component (column).

    M: (n_features, k). Returns (k, n_top) int array.
    """
    M = np.asarray(M)
    order = np.argsort(-M, axis=0)  # descending by weight per component
    return order[:n_top].T


def topic_terms_string(M: np.ndarray, vectorizer=None, vocabulary=None,
                       n_top_words: int = 10) -> str:
    """Human-readable 'Topic #j: w1 w2 ...' listing for a fitted factor."""
    M = np.asarray(M)
    vocab = _resolve_vocab(vectorizer, vocabulary, size=M.shape[0])
    idx = top_terms_per_component(M, n_top_words)
    lines: List[str] = []
    for j, row in enumerate(idx):
        terms = " ".join(str(vocab[i]) for i in row)
        lines.append(f"Topic #{j}: {terms}")
    return "\n".join(lines)


def top_component_samples(M: np.ndarray, n_top: int = 5) -> np.ndarray:
    """Indices of the rows (e.g. documents) most associated with each
    component — the sample-side counterpart of top_terms_per_component."""
    return top_terms_per_component(M, n_top)
