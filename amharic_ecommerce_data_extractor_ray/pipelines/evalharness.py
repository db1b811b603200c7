"""NER evaluation harness — distributed token/entity-level P/R/F1.

Mirrors the reference's seqeval-based evaluation (entity-span level,
/root/reference/src/models/ner_trainer.py:26-65) plus token-level accuracy,
implemented as a Ray pipeline: sentences → map_batches(tag + count TP/FP/FN
per label) → one partial counter row per batch → driver-side merge (counters
are tiny).  Scales to arbitrarily many sentences with no shuffle at all.

North-rule note: the fine-tuned XLM-R weights are not available in this
sandbox, so the deterministic check is tagger-vs-tagger parity — the engine's
HeuristicTagger must emit EXACTLY the reference pseudo-labeler's output on the
reference's own CoNLL corpus (P/R = 1.0; see tests/test_evalharness.py).
ModelTagger slots into the same ``tag_aligned`` interface unchanged.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..functions.tagger import HeuristicTagger


def tag_aligned(tagger, tokens: list[str]) -> list[str]:
    """Tag, then re-align output labels onto the ORIGINAL tokens.

    The heuristic price rule may split one input token into several output
    pieces (pseudo_labeler.py:62-75); pieces concatenate back to the original
    token — the merged token takes the first piece's label (B- wins).
    """
    pairs = tagger.tag(tokens)
    labels: list[str] = []
    pi = 0
    for tok in tokens:
        if pi >= len(pairs):
            labels.append("O")
            continue
        ptok, plab = pairs[pi]
        if ptok == tok:
            labels.append(plab)
            pi += 1
            continue
        # merge consecutive pieces until they rebuild the input token
        acc = ptok
        first_label = plab
        pi += 1
        while pi < len(pairs) and acc != tok:
            acc += pairs[pi][0]
            pi += 1
        labels.append(first_label)
    return labels


def extract_spans(labels: list[str]) -> set[tuple[int, int, str]]:
    """BIO → set of (start, end, type) spans (seqeval semantics: a span starts
    at B-X or at I-X not continuing a same-type run)."""
    spans = set()
    start, cur = None, None
    for i, lab in enumerate(labels):
        if lab == "O" or not lab:
            if cur:
                spans.add((start, i, cur))
            start, cur = None, None
            continue
        prefix, _, etype = lab.partition("-")
        if prefix == "B" or etype != cur:
            if cur:
                spans.add((start, i, cur))
            start, cur = i, etype
    if cur:
        spans.add((start, len(labels), cur))
    return spans


def _count_batch(batch: pa.Table, tagger) -> pa.Table:
    """Per-batch TP/FP/FN per entity type + token-level agreement counts."""
    tokens_col = batch["tokens"].to_pylist()
    labels_col = batch["labels"].to_pylist()
    counts: Counter = Counter()
    for toks, gold in zip(tokens_col, labels_col):
        pred = tag_aligned(tagger, list(toks))
        counts["n_tokens"] += len(gold)
        counts["n_token_match"] += sum(p == g for p, g in zip(pred, gold))
        gold_spans = extract_spans(list(gold))
        pred_spans = extract_spans(pred)
        for sp in pred_spans & gold_spans:
            counts[f"tp:{sp[2]}"] += 1
        for sp in pred_spans - gold_spans:
            counts[f"fp:{sp[2]}"] += 1
        for sp in gold_spans - pred_spans:
            counts[f"fn:{sp[2]}"] += 1
    keys = sorted(counts)
    return pa.table({"key": keys,
                     "count": pa.array([counts[k] for k in keys], pa.int64())})


def evaluate(sentences_ds, tagger=None) -> dict:
    """Entity-level P/R/F1 (micro + per-label) and token accuracy."""
    tagger = tagger or HeuristicTagger()
    partials = sentences_ds.map_batches(
        lambda b: _count_batch(b, tagger), batch_format="pyarrow")
    counts: Counter = Counter()
    for batch in partials.iter_batches(batch_format="pyarrow"):
        for k, c in zip(batch["key"].to_pylist(), batch["count"].to_pylist()):
            counts[k] += c

    labels = sorted({k.split(":", 1)[1] for k in counts if ":" in k})
    per_label = {}
    tp_all = fp_all = fn_all = 0
    for lab in labels:
        tp, fp, fn = counts[f"tp:{lab}"], counts[f"fp:{lab}"], counts[f"fn:{lab}"]
        tp_all, fp_all, fn_all = tp_all + tp, fp_all + fp, fn_all + fn
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        per_label[lab] = {"precision": p, "recall": r, "f1": f1,
                          "support": tp + fn}
    p = tp_all / (tp_all + fp_all) if tp_all + fp_all else 0.0
    r = tp_all / (tp_all + fn_all) if tp_all + fn_all else 0.0
    return {
        "precision": p,
        "recall": r,
        "f1": 2 * p * r / (p + r) if p + r else 0.0,
        "token_accuracy": (counts["n_token_match"] / counts["n_tokens"]
                           if counts["n_tokens"] else 0.0),
        "per_label": per_label,
        "n_tokens": counts["n_tokens"],
    }


def evaluate_file(conll_path: str, tagger=None) -> dict:
    from ..sources.conll import conll_to_dataset

    return evaluate(conll_to_dataset(conll_path), tagger)


def split_corpus(sentences_ds, *, test_size: float = 0.2, seed: int = 42):
    """O5: seeded train/test split (the reference's train_test_split(0.2,
    seed=42), ner_trainer.py:138) via ray.data.Dataset.train_test_split —
    deterministic for a pinned seed."""
    return sentences_ds.train_test_split(test_size=test_size, shuffle=True,
                                         seed=seed)
