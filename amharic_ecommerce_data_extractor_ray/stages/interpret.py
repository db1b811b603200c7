"""Model interpretability (A3): occlusion-based token attribution.

The reference's preliminary SHAP/LIME notebooks
(/root/reference/src/models/model_evaluator.py:228-626) score per-token
importance of the NER model's predictions.  shap/lime are unavailable
offline, so this implements the same question with the classic OCCLUSION
method (Zeiler & Fergus 2014; the perturbation family LIME belongs to):
mask one token at a time, re-run the model, and measure how much the
prediction over the whole sentence changes.

attribution(i) = (# token positions whose BIO label differs between the
base run and the run with token i masked) / n_tokens — self-effect included,
so a token whose own entity label vanishes when masked scores ≥ 1/n.

Scale shape: an actor-pool stage (model built once per actor in
``__init__``, per-piece features cached across variants, so each occlusion
re-run costs one small matmul).  Work is O(n_tokens²) pieces per sentence —
cap the input with a ``limit`` (the queries() entry analyzes a fixed head
slice, O2-style) or sample.
Model-agnostic: swaps to the HF tagger behind the same ``tag(tokens)``
contract when torch exists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASK = "<mask>"


class OcclusionAttributionStage:
    """map_batches actor: (message_id, tokens) → one row per token with its
    base label and occlusion attribution."""

    def __init__(self, *, dim: int = 32, seed: int = 20240801,
                 mask_token: str = MASK):
        from ..functions.np_model import NumpyTokenClassifier

        self.model = NumpyTokenClassifier(dim=dim, seed=seed)
        self.mask = mask_token

    def _labels(self, tokens: list[str]) -> list[str]:
        return [lab for _tok, lab in self.model.tag(tokens)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch["message_id"].to_pylist()
        tokens_col = batch["tokens"].to_pylist()
        out_mid, out_idx, out_tok, out_lab, out_chg, out_attr = \
            [], [], [], [], [], []
        for mid, toks in zip(mids, tokens_col):
            toks = toks or []
            n = len(toks)
            if n == 0:
                continue
            base = self._labels(toks)
            for i in range(n):
                occluded = toks[:i] + [self.mask] + toks[i + 1:]
                labs = self._labels(occluded)
                changed = sum(1 for a, b in zip(base, labs) if a != b)
                out_mid.append(mid)
                out_idx.append(i)
                out_tok.append(toks[i])
                out_lab.append(base[i])
                out_chg.append(changed)
                out_attr.append(round(changed / n, 6))
        return pa.table({
            "message_id": pa.array(out_mid, pa.int64()),
            "tok_idx": pa.array(out_idx, pa.int64()),
            "token": pa.array(out_tok, pa.string()),
            "base_label": pa.array(out_lab, pa.string()),
            "n_changed": pa.array(out_chg, pa.int64()),
            "attribution": pa.array(out_attr, pa.float64()),
        })


def token_attribution(corpus_ds, *, limit: int = 40, concurrency: int = 2,
                      batch_size: int = 16):
    """Occlusion attribution over the first ``limit`` corpus messages
    (deterministic O2-style head slice): corpus → normalize/tokenize →
    actor-pool occlusion stage.  Returns one row per (message, token)."""
    from ..stages.enrich import enrich_batch

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"message_id": b["message_id"],
                         "tokens": b["tokens"]})

    return (corpus_ds.limit(limit)
            .map_batches(enrich_batch, batch_format="pyarrow")
            .map_batches(project, batch_format="pyarrow")
            .map_batches(OcclusionAttributionStage, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency))
