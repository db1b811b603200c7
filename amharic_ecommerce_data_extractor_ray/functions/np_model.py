"""Deterministic numpy token-classification model (A1/S11 verification path).

torch/transformers are unavailable in this sandbox, so this module provides a
REAL batched forward pass with the same dataflow shape as the HF pipeline the
reference serves (model_evaluator.py:44-142): subword tokenize → featurize →
one (n_subwords × dim) @ (dim × n_labels) matmul per batch → argmax → span
aggregation ("simple": merge adjacent same-entity subwords with char
offsets) → char-cursor alignment back onto pipeline tokens (M18,
functions/tagger.align_spans_to_tokens).  Weights are seeded-random and
deterministic, so distributed actor-pool inference is oracle-checkable.

Swap ``NumpyTokenClassifier`` for an HF checkpoint via
``functions.tagger.ModelTagger`` when torch exists — the stage contract
(``tag(tokens) -> [(token, bio_label)]``) is identical.
"""

from __future__ import annotations

import hashlib

import numpy as np

# entity groups in HF aggregation output ("O" = index 0, never a span)
GROUPS = ("O", "PRODUCT", "PRICE", "LOC", "CONTACT_INFO")

MAX_PIECE_CHARS = 4


def subword_split(token: str) -> list[str]:
    """Deterministic subword splitter standing in for a BPE/WordPiece
    tokenizer: fixed-width character pieces.  Multi-piece words make the
    word_ids → -100 masking and span→token alignment paths non-trivial."""
    if not token:
        return [token]
    return [token[i:i + MAX_PIECE_CHARS]
            for i in range(0, len(token), MAX_PIECE_CHARS)]


class HashEmbedder:
    """Deterministic document embedder (the embedding-GENERATION stage an
    embed→ANN pipeline needs): per-token hashed byte features, mean-pooled
    over the document.  Stands in for a sentence-transformer behind the same
    actor-pool contract; byte-exact SQL mirror exists (md5 hex arithmetic)."""

    def __init__(self, *, dim: int = 32):
        assert dim <= 32
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def token_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            d = (hashlib.md5(tok.encode("utf-8")).digest()
                 + hashlib.md5((tok + "\x01").encode("utf-8")).digest())
            v = np.frombuffer(d[:self.dim], dtype=np.uint8) / 255.0
            if len(self._cache) < 65536:
                self._cache[tok] = v
        return v

    def embed(self, text: str) -> np.ndarray | None:
        toks = (text or "").split()
        if not toks:
            return None
        return np.mean([self.token_vec(t) for t in toks], axis=0)


class NumpyTokenClassifier:
    """Tiny linear token classifier over hashed character features.

    ``forward`` is genuinely batched: ONE matmul for all subwords passed in —
    the shape an actor-pool inference stage must feed to amortize at scale.
    """

    def __init__(self, *, dim: int = 32, seed: int = 20240801):
        rng = np.random.default_rng(seed)
        self.dim = dim
        self.W = rng.standard_normal((dim, len(GROUPS)))
        self.b = rng.standard_normal(len(GROUPS)) * 0.1
        self._feat_cache: dict[str, np.ndarray] = {}

    def featurize(self, pieces: list[str]) -> np.ndarray:
        feats = np.empty((len(pieces), self.dim), dtype=np.float64)
        cache = self._feat_cache
        for i, p in enumerate(pieces):
            f = cache.get(p)
            if f is None:
                d = (hashlib.md5(p.encode("utf-8")).digest()
                     + hashlib.md5((p + "\x01").encode("utf-8")).digest())
                f = np.frombuffer(d[:self.dim], dtype=np.uint8) / 255.0
                if len(cache) < 65536:
                    cache[p] = f
            feats[i] = f
        return feats

    def forward(self, pieces: list[str]) -> np.ndarray:
        """(n_pieces,) group-index predictions from one batched matmul."""
        if not pieces:
            return np.empty(0, dtype=np.int64)
        logits = self.featurize(pieces) @ self.W + self.b
        return np.argmax(logits, axis=1)

    # ---- HF-pipeline-shaped inference over one sentence ----

    def predict_spans(self, tokens: list[str]) -> list[dict]:
        """Char-offset entity spans over ``" ".join(tokens)`` (aggregation
        "simple": adjacent same-group subwords merge)."""
        pieces, ends = self._pieces_with_offsets(tokens)
        preds = self.forward([p for p, _, _ in pieces])
        return self._aggregate(pieces, preds)

    @staticmethod
    def _pieces_with_offsets(tokens: list[str]):
        pieces = []  # (piece, char_start, char_end)
        pos = 0
        for ti, tok in enumerate(tokens):
            for piece in subword_split(tok):
                pieces.append((piece, pos, pos + len(piece)))
                pos += len(piece)
            pos += 1  # the joining space
        return pieces, pos

    @staticmethod
    def _aggregate(pieces, preds) -> list[dict]:
        spans = []
        cur_g, cur_s, cur_e = 0, -1, -1
        for (piece, s, e), g in zip(pieces, preds):
            if g != 0 and g == cur_g and s <= cur_e + 1:
                cur_e = e
                continue
            if cur_g != 0:
                spans.append({"start": cur_s, "end": cur_e,
                              "entity_group": GROUPS[cur_g]})
            cur_g, cur_s, cur_e = int(g), s, e
        if cur_g != 0:
            spans.append({"start": cur_s, "end": cur_e,
                          "entity_group": GROUPS[cur_g]})
        return spans

    def tag(self, tokens: list[str]) -> list[tuple[str, str]]:
        """ModelTagger-compatible interface: spans → BIO on pipeline tokens
        via the M18 char-cursor alignment."""
        from .tagger import align_spans_to_tokens

        text = " ".join(tokens)
        return align_spans_to_tokens(text, tokens,
                                     self.predict_spans(tokens))
