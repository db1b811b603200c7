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


class TaggerAgreementStage:
    """Actor-pool stage for the rule-vs-model agreement audit (the check a
    team runs before promoting a pseudo-labeler to silver-label producer):
    ONE corpus pass tags every message with BOTH the heuristic rule tagger
    and the numpy model forward pass, then emits per-batch confusion
    partials (rule_label, model_label, n) — no join between two prediction
    tables, no per-token shuffle; the exchange is label-vocab² sized.

    Model weights build once per actor (``NumpyModelTagStage`` in
    ``__init__``); both taggers consume the same normalize→tokenize token
    sequence, so labels align positionally by construction."""

    def __init__(self):
        from ..stages.enrich import NumpyModelTagStage

        self._model = NumpyModelTagStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.enrich import _tag_rows

        texts = batch["content"].to_pylist()
        rule = _tag_rows(texts)
        tokens_col = [[t for t, _ in pairs] for pairs in rule]
        mt = self._model(pa.table(
            {"tokens": pa.array(tokens_col, pa.list_(pa.string()))}))
        mlabels = mt["tag_labels"].to_pylist()
        c: Counter = Counter()
        for pairs, ml in zip(rule, mlabels):
            for (_, rl), m in zip(pairs, ml):
                c[(rl, m)] += 1
        ks = sorted(c)
        return pa.table({
            "rule_label": pa.array([k[0] for k in ks], pa.string()),
            "model_label": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64()),
        })


def tagger_confusion(sf_dir: str):
    """Rule-vs-model token-level confusion matrix over the corpus."""
    from ray.data.aggregate import Sum

    from .kg import corpus_ds

    return (corpus_ds(sf_dir)
            .map_batches(TaggerAgreementStage, batch_format="pyarrow",
                         batch_size=256, concurrency=2)
            .groupby(["rule_label", "model_label"])
            .aggregate(Sum("n", alias_name="n")))


def tagger_kappa(sf_dir: str):
    """Cohen's kappa between the rule tagger and the model tagger — chance-
    corrected inter-annotator agreement.  The driver folds only the
    label-vocab² confusion matrix; everything token-sized stays distributed
    in ``tagger_confusion``."""
    import math

    import pandas as pd

    cm = tagger_confusion(sf_dir).to_pandas()
    n = int(cm["n"].sum())
    agree = int(cm.loc[cm["rule_label"] == cm["model_label"], "n"].sum())
    rows = cm.groupby("rule_label")["n"].sum()
    cols = cm.groupby("model_label")["n"].sum()
    pe_num = sum(int(rows.get(l, 0)) * int(cols.get(l, 0))
                 for l in set(rows.index) | set(cols.index))
    po = agree / n
    pe = pe_num / (n * n)
    kappa = (po - pe) / (1.0 - pe)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    return pd.DataFrame({
        "n_tokens": pd.array([n], dtype="int64"),
        "n_agree": pd.array([agree], dtype="int64"),
        "po": [r6(po)], "pe": [r6(pe)], "kappa": [r6(kappa)],
    })
