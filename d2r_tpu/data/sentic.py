"""SenticNet affective-graph construction.

The reference ships a 39,891-entry word->polarity lexicon
(ref: processor/senticnet_word.txt) and a graph builder that the live
training path never imports (ref: processor/generate_sentic_graph.py:5-41;
SURVEY.md section 2.2 "vestigial"). It is still part of the reference's
public surface and BASELINE config 2 enables it, so we provide:

  * the 39,891-entry lexicon asset vendored at
    ``d2r_tpu/data/assets/senticnet_word.txt`` (it is part of the reference's
    public surface); ``load_sentic_lexicon()`` defaults to it, or point
    ``sentic_lexicon_path`` at another file;
  * the same affective adjacency construction, plus a batched static-shape
    variant that pads to max_seq so it jits;
  * batching happens on the host (numpy) — the adjacency feeds the optional
    GCN refinement module in models/graph.py.

Reference semantics reproduced exactly: word polarity + 1 (plus 1 more when
the word is in the aspect) is added to the word's full row AND column, and
zero diagonal entries are forced to 1 (ref: generate_sentic_graph.py:26-40).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

DEFAULT_LEXICON_PATH = os.path.join(
    os.path.dirname(__file__), "assets", "senticnet_word.txt")


def load_sentic_lexicon(path: Optional[str] = None) -> Dict[str, float]:
    """word\tpolarity pairs, polarity in [-1, 1]
    (ref: processor/generate_sentic_graph.py:5-19). Defaults to the vendored
    asset."""
    path = path or DEFAULT_LEXICON_PATH
    lex: Dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            word, sentic = line.split("\t")
            lex[word] = float(sentic)
    return lex


def affective_adjacency(
    text: str,
    aspect: str,
    lexicon: Dict[str, float],
) -> np.ndarray:
    """(seq_len, seq_len) affective adjacency
    (ref: processor/generate_sentic_graph.py:21-41)."""
    words = text.split()
    n = len(words)
    matrix = np.zeros((n, n), np.float32)
    for i, word in enumerate(words):
        sentic = float(lexicon[word]) + 1.0 if word in lexicon else 0.0
        if word in aspect:
            sentic += 1.0
        # added to the full row AND column (diagonal gets 2x)
        matrix[i, :] += sentic
        matrix[:, i] += sentic
    for i in range(n):
        if matrix[i, i] == 0:
            matrix[i, i] = 1.0
    return matrix


def batched_affective_adjacency(
    texts: Sequence[str],
    lexicon: Dict[str, float],
    max_seq: int,
    aspects: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """Static-shape (B, max_seq, max_seq) batch, zero-padded beyond each
    sample's word count, with unit diagonal on padding rows so the GCN's
    degree normalisation stays well-defined."""
    batch = np.zeros((len(texts), max_seq, max_seq), np.float32)
    for b, text in enumerate(texts):
        aspect = aspects[b] if aspects is not None else ""
        adj = affective_adjacency(text, aspect, lexicon)
        n = min(adj.shape[0], max_seq)
        batch[b, :n, :n] = adj[:n, :n]
        for i in range(n, max_seq):
            batch[b, i, i] = 1.0
    return batch
