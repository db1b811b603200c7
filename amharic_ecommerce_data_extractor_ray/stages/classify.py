"""Distributed quality-classifier training (round 3, batch 7).

Full-batch logistic regression by gradient descent over document quality
features — the canonical "train a cheap quality filter over the corpus"
step of LLM data pipelines (fasttext/DSIR-style).  Reference analog: the
model-training ambitions of /root/reference/src/models/ner_trainer.py,
re-expressed as a Ray Data aggregate loop (each GD step is ONE streaming
pass: a vectorized per-batch gradient kernel + native Sum merges; the
driver holds only the weight vector).

Scale notes: the feature table is projected once (3 doubles + label per
document) and materialized so the ``n_iter`` passes re-scan the skinny
columns, not the raw text — at 100 TB swap the materialize for a
``write_parquet``/``read_parquet`` spill or recompute per pass; either
way no stage ever holds more than a block of features, and the driver
state is O(d).  Gradient sums are float64 — merge-order noise is ~1e-15
relative per step and the published weights round to 6 dp, far above it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .seqprep import _ws_tokens


def _feature_batch(b: pa.Table, *, text_col: str, label_lang: str) -> pa.Table:
    _, n_tok = _ws_tokens(b[text_col])
    x1 = pc.divide(pc.cast(b["n_chars"], pa.float64()), pa.scalar(100.0))
    x2 = pa.array(n_tok.astype(np.float64) / 10.0, pa.float64())
    y = pc.cast(pc.equal(b["lang"], pa.scalar(label_lang)), pa.float64())
    return pa.table({"x1": x1, "x2": x2, "y": y})


def quality_logreg(docs_ds, *, text_col: str = "text",
                   label_lang: str = "en", lr: float = 0.5,
                   n_iter: int = 4) -> pd.DataFrame:
    """Train w ∈ R³ (bias, chars/100, ws_tokens/10) to predict
    ``lang == label_lang`` with ``n_iter`` full-batch GD steps from w=0;
    returns one row: weights (6 dp), doc count, training accuracy.

    Each step: sum over docs of (σ(x·w) − y)·x via one ``map_batches`` +
    native ``Dataset.sum`` — a pure combiner shape, no shuffle beyond the
    scalar fold."""
    feats = docs_ds.map_batches(
        lambda b: _feature_batch(b, text_col=text_col,
                                 label_lang=label_lang),
        batch_format="pyarrow").materialize()
    n = feats.count()
    w = np.zeros(3, dtype=np.float64)

    for _ in range(n_iter):
        w0, w1, w2 = float(w[0]), float(w[1]), float(w[2])

        def grad(b: pa.Table, _w=(w0, w1, w2)) -> pa.Table:
            a0, a1, a2 = _w
            x1 = b["x1"].to_numpy(zero_copy_only=False)
            x2 = b["x2"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False)
            z = a0 + a1 * x1 + a2 * x2
            d = 1.0 / (1.0 + np.exp(-z)) - y
            return pa.table({"g0": pa.array(d, pa.float64()),
                             "g1": pa.array(d * x1, pa.float64()),
                             "g2": pa.array(d * x2, pa.float64())})

        sums = feats.map_batches(grad, batch_format="pyarrow").sum(
            ["g0", "g1", "g2"])
        g = np.array([sums["sum(g0)"], sums["sum(g1)"], sums["sum(g2)"]])
        w = w - lr * g / n

    w0, w1, w2 = float(w[0]), float(w[1]), float(w[2])

    def correct(b: pa.Table, _w=(w0, w1, w2)) -> pa.Table:
        a0, a1, a2 = _w
        x1 = b["x1"].to_numpy(zero_copy_only=False)
        x2 = b["x2"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        pred = (a0 + a1 * x1 + a2 * x2) > 0.0
        return pa.table({"ok": pa.array((pred == (y == 1.0))
                                        .astype(np.float64), pa.float64())})

    n_ok = feats.map_batches(correct, batch_format="pyarrow").sum("ok")

    def r6(x: float) -> float:
        return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)

    return pd.DataFrame({
        "w0": [r6(w0)], "w1": [r6(w1)], "w2": [r6(w2)],
        "n_docs": [int(n)],
        "accuracy": [r6(n_ok / n)],
    })


def binary_auc(docs_ds, *, score_col: str = "n_chars",
               label_lang: str = "en") -> pd.DataFrame:
    """Exact ROC-AUC of an integer score against a binary label — the
    rank-sum (Mann-Whitney) statistic every quality-classifier evaluation
    step computes, with average-rank tie handling.

    Shape: one combiner scan builds the per-distinct-score (pos, neg)
    contingency (per-batch Arrow ``group_by`` → native ``Sum`` merge), so
    only the score vocabulary shuffles; the driver folds cumulative
    counts over that small table.  Because the score is integer, every
    pair contribution is a half-integer — doubling it keeps the whole
    numerator in exact int64 (pairs2 = Σ pos_s·(2·cum_neg_below + neg_s)),
    so the statistic is bit-stable under any merge order."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        y = pc.cast(pc.equal(b["lang"], pa.scalar(label_lang)), pa.int64())
        t = pa.table({"s": pc.cast(b[score_col], pa.int64()), "p": y,
                      "q": pc.subtract(pa.scalar(1, pa.int64()), y)})
        return (t.group_by(["s"]).aggregate([("p", "sum"), ("q", "sum")])
                .rename_columns(["s", "p", "q"]))

    cells = (docs_ds.map_batches(partials, batch_format="pyarrow")
             .groupby("s")
             .aggregate(Sum("p", alias_name="p"), Sum("q", alias_name="q"))
             .to_pandas().sort_values("s").reset_index(drop=True))
    p = cells["p"].to_numpy(np.int64)
    q = cells["q"].to_numpy(np.int64)
    cum_q_below = np.concatenate(([0], np.cumsum(q)[:-1]))
    pairs2 = int(np.sum(p * (2 * cum_q_below + q)))
    n_pos, n_neg = int(p.sum()), int(q.sum())
    auc = pairs2 / (2.0 * n_pos * n_neg)
    return pd.DataFrame({
        "n": [np.int64(n_pos + n_neg)],
        "n_pos": [np.int64(n_pos)],
        "n_neg": [np.int64(n_neg)],
        "auc": [float(np.floor(auc * 1e6 + 0.5) / 1e6)],
    })


def calibration_bins(docs_ds, *, score_col: str = "n_chars",
                     cap: int = 600, bins: int = 10,
                     label_lang: str = "en") -> pd.DataFrame:
    """Reliability diagram: bin a [0,1] predicted score (here the length
    proxy min(n_chars, cap)/cap) and report per-bin count, mean
    prediction, and empirical positive rate — the calibration check run
    after any quality-filter training.

    Shape: pure combiner (per-batch ``group_by(bin)`` with int64 sums of
    the capped score and the label), so only O(bins) cells shuffle and
    every sum is exact regardless of merge order; bin assignment is
    integer arithmetic ((c·bins) // cap, clamped) so no float boundary
    can disagree with the SQL mirror."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        c = np.minimum(np.asarray(b[score_col].to_numpy(
            zero_copy_only=False), np.int64), cap)
        bin_ = np.minimum(c * bins // cap, bins - 1)
        y = pc.cast(pc.equal(b["lang"], pa.scalar(label_lang)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"bin": pa.array(bin_, pa.int64()),
                      "c": pa.array(c, pa.int64()),
                      "y": pa.array(y, pa.int64()),
                      "n": pa.array(np.ones(len(c), np.int64))})
        return (t.group_by(["bin"])
                .aggregate([("c", "sum"), ("y", "sum"), ("n", "sum")])
                .rename_columns(["bin", "c", "y", "n"]))

    cells = (docs_ds.map_batches(partials, batch_format="pyarrow")
             .groupby("bin")
             .aggregate(Sum("c", alias_name="c"), Sum("y", alias_name="y"),
                        Sum("n", alias_name="n"))
             .to_pandas().sort_values("bin").reset_index(drop=True))

    def r6(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6

    n = cells["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "bin": cells["bin"].astype("int64"),
        "n": cells["n"].astype("int64"),
        "mean_pred": r6(cells["c"].to_numpy(np.float64) / (cap * n)),
        "frac_pos": r6(cells["y"].to_numpy(np.float64) / n),
    })
