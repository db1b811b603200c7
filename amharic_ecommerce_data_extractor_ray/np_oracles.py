"""Driver-side NUMPY oracles for the three queries whose semantics are not
SQL-expressible (``embedding_pca`` — eigendecomposition, ``unigram_train`` —
Viterbi hard-EM, ``interpret_occlusion`` — model scoring).  VERDICT r4 #4:
these were rows-only in the consolidated gate; each function here recomputes
the full expected VALUE table single-process (no Ray), so
``scripts/check_oracles.py`` can value-compare 223/223 instead of 220/223.

Independence boundary (same stance as goldens.py): deterministic SEMANTIC
kernels are shared on purpose — the corpus generator (`corpus_batch`), the
normalize/tokenize batch kernel (`enrich_batch`) and the seeded numpy NER
model (`NumpyTokenClassifier`) ARE the spec under test, already pinned by
executed-reference goldens and fuzz tests.  What these oracles do NOT share
is any Ray execution: no Dataset, no map_batches, no actor pool, no
groupby/sort shuffle — a dense pandas/numpy recompute of the whole answer.
That is exactly the axis the SQL oracles can't see for these three queries
(the r4 CC id-corruption and the r5 empty-block float64 poisoning were both
DISTRIBUTION bugs invisible to any single-process mirror of the math).

Float tolerance: both sides round to 1e-6, but the engine folds sums in
block order while these oracles fold densely, so a value landing within fp
noise of a rounding boundary can differ by exactly 1e-6 —
``check_oracles`` compares numpy-oracle floats with atol 2e-6 (ints and
strings stay exact).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

# RE2's \s (used by the engine's _ws_tokens split) is ASCII-only:
# [\t\n\f\r ].  Python re's \s is unicode-aware, so spell the class out.
_RE2_WS = re.compile("[\t\n\f\r ]+")


def np_embedding_pca(sf_dir: str, *, dim: int = 64, k: int = 4,
                     ndigits: int = 6) -> pd.DataFrame:
    """Dense recompute of ``similarity.embedding_pca`` (stages/similarity.py):
    covariance → ``eigh`` → top-k components with the same
    largest-|entry|-positive sign convention → projection, all in one numpy
    pass over the raw parquet (the engine computes the covariance through a
    distributed one-pass Gram fold and projects via map_batches)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    assert X.shape[1] == dim
    n = len(X)
    mean = X.mean(axis=0)
    # same algebraic form as the engine's fold: (S - n·mmᵀ) / (n-1)
    S = X.T @ X
    cov = (S - n * np.outer(mean, mean)) / (n - 1)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    comps = comps * flip
    P = (X - mean) @ comps
    out = {"vec_id": ids.astype(np.int64)}
    for c in range(k):
        out[f"pc{c + 1}"] = np.floor(
            P[:, c] * 10.0 ** ndigits + 0.5) / 10.0 ** ndigits
    return pd.DataFrame(out)


def np_interpret_occlusion(sf_dir: str, *, limit: int = 40,
                           dim: int = 32, seed: int = 20240801,
                           mask: str = "<mask>") -> pd.DataFrame:
    """Plain-python recompute of ``interpret.token_attribution``: first
    ``limit`` corpus messages (documents parquet order, exactly what the
    engine's ``corpus_ds(sf_dir).limit(limit)`` yields), tokenize via the
    shared batch kernel, then the occlusion loop — mask each position,
    re-tag, count changed labels — without Ray's actor pool / batching."""
    from .functions.np_model import NumpyTokenClassifier
    from .sources.corpus import corpus_batch
    from .stages.enrich import enrich_batch

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])["doc_id"] \
        .to_numpy(zero_copy_only=False)[:limit]
    corpus = corpus_batch(doc_ids)
    enriched = enrich_batch(corpus)
    model = NumpyTokenClassifier(dim=dim, seed=seed)

    rows = []
    for mid, toks in zip(enriched["message_id"].to_pylist(),
                         enriched["tokens"].to_pylist()):
        toks = toks or []
        n = len(toks)
        if n == 0:
            continue
        base = [lab for _t, lab in model.tag(toks)]
        for i in range(n):
            labs = [lab for _t, lab in
                    model.tag(toks[:i] + [mask] + toks[i + 1:])]
            changed = sum(1 for a, b in zip(base, labs) if a != b)
            rows.append((mid, i, toks[i], base[i], changed,
                         round(changed / n, 6)))
    return pd.DataFrame(rows, columns=["message_id", "tok_idx", "token",
                                       "base_label", "n_changed",
                                       "attribution"])


def np_unigram_train(sf_dir: str, *, max_piece_len: int = 4,
                     seed_size: int = 400, vocab_size: int = 150,
                     n_iters: int = 2) -> pd.DataFrame:
    """Pure-python recompute of ``seqprep.unigram_train`` (Kudo 2018 hard-EM
    with the repo's determinism choices): Counter-based word vocabulary and
    substring seed (the engine uses Arrow slice kernels + distributed
    folds), then the identical Viterbi E-step / top-k M-step loop."""
    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    vocab: Counter = Counter()
    for t in texts:
        for w in _RE2_WS.split(t or ""):
            if w:
                vocab[w] += 1

    seed: Counter = Counter()
    for w, f in vocab.items():
        L = len(w)
        for s in range(L):
            for ln in range(1, max_piece_len + 1):
                if s + ln > L:
                    break
                seed[w[s:s + ln]] += f

    seed_df = (pd.DataFrame(sorted(seed.items()),
                            columns=["piece", "n"])
               .sort_values(["n", "piece"], ascending=[False, True]))
    top = seed_df.head(seed_size)
    chars = seed_df[seed_df["piece"].str.len() == 1]
    cur = (pd.concat([top, chars]).drop_duplicates("piece")
           .reset_index(drop=True))

    def viterbi(w: str, logp: dict) -> list[str] | None:
        L = len(w)
        best: list[tuple[float, int]] = [(-math.inf, -1)] * (L + 1)
        best[0] = (0.0, 0)
        for j in range(1, L + 1):
            for i in range(max(0, j - max_piece_len), j):
                lp = logp.get(w[i:j])
                if lp is None or best[i][0] == -math.inf:
                    continue
                cand = best[i][0] + lp
                if cand > best[j][0]:
                    best[j] = (cand, i)
        if best[L][0] == -math.inf:
            return None
        pieces, j = [], L
        while j > 0:
            i = best[j][1]
            pieces.append(w[i:j])
            j = i
        return pieces

    for _ in range(n_iters):
        total = int(cur["n"].sum())
        floor_lp = math.log(0.5 / total)
        logp = {p: (math.log(n / total) if n > 0 else floor_lp)
                for p, n in zip(cur["piece"], cur["n"])}
        counts: Counter = Counter()
        for w, f in vocab.items():
            seg = viterbi(w, logp)
            if seg is None:
                continue
            for p in seg:
                counts[p] += f
        merged = (pd.DataFrame(sorted(counts.items()),
                               columns=["piece", "n"])
                  .astype({"n": "int64"})
                  .sort_values(["n", "piece"], ascending=[False, True]))
        keep = merged.head(vocab_size)
        singles = merged[merged["piece"].str.len() == 1]
        prev_singles = cur[cur["piece"].str.len() == 1]["piece"]
        missing = prev_singles[~prev_singles.isin(merged["piece"])]
        zero_rows = pd.DataFrame({"piece": missing.to_numpy(),
                                  "n": 0}).astype({"n": "int64"})
        cur = (pd.concat([keep, singles, zero_rows])
               .drop_duplicates("piece").reset_index(drop=True))

    total = int(cur["n"].sum())
    cur = cur.sort_values(["n", "piece"],
                          ascending=[False, True]).reset_index(drop=True)
    floor_lp = math.log(0.5 / total)
    cur["logprob"] = cur["n"].map(
        lambda n: round(math.log(n / total) if n > 0 else floor_lp, 6))
    return cur


def numpy_oracles() -> dict:
    """name → callable(sf_dir) -> DataFrame, one entry per rows-only query."""
    return {
        "embedding_pca": np_embedding_pca,
        "interpret_occlusion": np_interpret_occlusion,
        "unigram_train": np_unigram_train,
    }
