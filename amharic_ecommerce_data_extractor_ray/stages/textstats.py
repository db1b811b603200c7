"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All stateless vectorized map_batches stages; every
formula is integer/regex arithmetic both Python and DuckDB can evaluate
identically (see the oracle SQL), except the rolling-hash fingerprint (not
SQL-expressible → rows-only check).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

ETHIOPIC = re.compile(r"[ሀ-፿]")
NONSPACE = re.compile(r"\S")
# BPE-ish word/number/other segmentation — RE2-compatible so the DuckDB
# oracle runs the same pattern
TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[ሀ-፿]+|[^\sA-Za-z0-9ሀ-፿]")
PUNCT_RE = re.compile(r"[.,;:!?\-]")

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")


def langid_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """Script-based language ID: 'am' when Ethiopic chars are > 30% of
    non-space chars, 'und' for empty, else 'other'."""
    texts = batch[text_col].to_pylist()
    preds = []
    for t in texts:
        t = t or ""
        total = len(NONSPACE.findall(t))
        if total == 0:
            preds.append("und")
            continue
        eth = len(ETHIOPIC.findall(t))
        preds.append("am" if eth * 10 > total * 3 else "other")
    return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def token_count_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count."""
    texts = batch[text_col].to_pylist()
    ws, bpe = [], []
    for t in texts:
        t = t or ""
        ws.append(len(t.split()))
        bpe.append(len(TOKEN_RE.findall(t)))
    return (batch
            .append_column("n_ws_tokens", pa.array(ws, pa.int64()))
            .append_column("n_bpe_tokens", pa.array(bpe, pa.int64())))


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality signals over a document table: length, punct density, stopword
    ratio, mean word length — all exact-rational so SQL reproduces them."""
    texts = batch[text_col].to_pylist()
    n_chars, n_tokens, n_punct, n_stop = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        n_punct.append(len(PUNCT_RE.findall(t)))
        n_stop.append(sum(1 for w in toks if w in STOPWORDS_EN))
    return (batch
            .append_column("q_chars", pa.array(n_chars, pa.int64()))
            .append_column("q_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("q_punct", pa.array(n_punct, pa.int64()))
            .append_column("q_stopwords", pa.array(n_stop, pa.int64())))


_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PHONE_RE = re.compile(r"\+?\d[\d ]{8,}\d")


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """PII redaction pass (training-data hygiene): emails → <EMAIL>, long
    digit runs (phone-shaped) → <PHONE>.  RE2-compatible patterns so the
    DuckDB oracle applies the identical regexes."""
    texts = batch[text_col].to_pylist()
    out = []
    for t in texts:
        t = t or ""
        t = _EMAIL_RE.sub("<EMAIL>", t)
        t = _PHONE_RE.sub("<PHONE>", t)
        out.append(t)
    return batch.append_column("scrubbed", pa.array(out, pa.string()))


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Polynomial rolling hash over UTF-8 bytes (mod 2^61-1) — a cheap,
    deterministic document fingerprint usable as a shard-stable dedup/join
    key.  Not SQL-expressible; covered by a rows-only driver check + pytest."""
    texts = batch[text_col].to_pylist()
    fps = []
    for t in texts:
        h = 0
        for byte in (t or "").encode("utf-8"):
            h = (h * _FP_BASE + byte) % _FP_MOD
        fps.append(h)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def repetition_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", App. A —
    repetition filters): per document, the fraction of tokens accounted for
    by the most frequent token and the fraction of bigrams accounted for by
    the most frequent bigram.  High values flag boilerplate/spam for the
    curation pipeline.

    Fully vectorized: ONE explode to flat (doc_idx, token) arrays, token
    identity factorized to int codes, bigrams packed into a single int64 —
    all counting happens in C-level pandas groupbys, no per-document Python
    loop.  Rounding mirrors DuckDB's half-away ``round(x, 6)`` exactly
    (floor(x*1e6 + 0.5) for non-negative x) so the oracle is bit-identical.
    """
    import numpy as np
    import pandas as pd

    tl = pc.split_pattern(batch[text_col], pattern=" ")
    counts = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
    n_docs = len(batch)
    doc_idx = np.repeat(np.arange(n_docs), counts)
    flat = tl.combine_chunks().flatten() if isinstance(tl, pa.ChunkedArray) \
        else tl.flatten()
    codes = pd.factorize(flat.to_pandas())[0].astype(np.int64)

    # top token count per doc: group by (doc, code), then max per doc
    tok_df = pd.DataFrame({"d": doc_idx, "c": codes})
    per_tok = tok_df.groupby(["d", "c"], sort=False).size()
    top_tok = per_tok.groupby(level=0).max()
    top_tok = top_tok.reindex(np.arange(n_docs), fill_value=0).to_numpy()

    # bigrams: adjacent code pairs within the same doc, packed to int64
    same_doc = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) > 1 \
        else np.zeros(0, dtype=bool)
    bg_d = doc_idx[:-1][same_doc]
    bg_key = (codes[:-1][same_doc] << 32) | codes[1:][same_doc]
    if len(bg_d):
        bg_df = pd.DataFrame({"d": bg_d, "k": bg_key})
        per_bg = bg_df.groupby(["d", "k"], sort=False).size()
        top_bg = (per_bg.groupby(level=0).max()
                  .reindex(np.arange(n_docs), fill_value=0).to_numpy())
    else:
        top_bg = np.zeros(n_docs, dtype=np.int64)

    def round6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    n_tok = counts.astype(np.int64)
    n_bg = np.maximum(n_tok - 1, 0)
    tok_frac = round6(np.where(n_tok > 0, top_tok / np.maximum(n_tok, 1), 0.0))
    bg_frac = round6(np.where(n_bg > 0, top_bg / np.maximum(n_bg, 1), 0.0))
    return (batch
            .append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("top_token_frac", pa.array(tok_frac, pa.float64()))
            .append_column("top_bigram_frac", pa.array(bg_frac, pa.float64())))


def entropy_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Shannon entropy of each document's token distribution (nats) — the
    classic diversity/quality signal next to the Gopher repetition filters:
    near-zero entropy flags keyword-stuffed or template spam, high entropy
    natural prose.

    Same fully-vectorized shape as ``repetition_batch``: one explode to flat
    (doc_idx, token-code) arrays, per-(doc, code) counts from a C-level
    pandas groupby, then ``-Σ p·ln p`` folded per doc — no per-document
    Python loop.  Single-space tokenization and half-away round(·, 6)
    mirror the DuckDB oracle exactly."""
    import numpy as np
    import pandas as pd

    tl = pc.split_pattern(batch[text_col], pattern=" ")
    counts = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
    n_docs = len(batch)
    doc_idx = np.repeat(np.arange(n_docs), counts)
    flat = tl.combine_chunks().flatten() if isinstance(tl, pa.ChunkedArray) \
        else tl.flatten()
    codes = pd.factorize(flat.to_pandas())[0].astype(np.int64)

    per_tok = (pd.DataFrame({"d": doc_idx, "c": codes})
               .groupby(["d", "c"], sort=False).size())
    d = per_tok.index.get_level_values(0).to_numpy()
    c = per_tok.to_numpy(np.float64)
    n_tok = counts.astype(np.int64)
    p = c / n_tok[d]
    ent = (pd.Series(-p * np.log(p)).groupby(d).sum()
           .reindex(np.arange(n_docs), fill_value=0.0).to_numpy())
    ent = np.floor(ent * 1e6 + 0.5) / 1e6
    return (batch
            .append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("token_entropy", pa.array(ent, pa.float64())))


_URL_RE = None


def top_domains_batch(batch: pa.Table, *, text_col: str = "content",
                      channel_col: str = "repo") -> pa.Table:
    """Per-block URL-domain partials: findall over each message with ONE
    module-compiled regex (the pattern is RE2-compatible so the DuckDB
    ``regexp_extract_all`` oracle matches byte-for-byte), scheme stripped,
    pre-aggregated to (channel, domain, n) inside the block.  The global
    rollup (mentions + distinct channels) is a vocabulary-sized groupby."""
    import re

    global _URL_RE
    if _URL_RE is None:
        _URL_RE = re.compile(
            r"(https?://[A-Za-z0-9.\-]+|www\.[A-Za-z0-9.\-]+)")
    from collections import Counter

    c: Counter = Counter()
    for repo, text in zip(batch[channel_col].to_pylist(),
                          batch[text_col].to_pylist()):
        for u in _URL_RE.findall(text or ""):
            d = u[8:] if u.startswith("https://") else \
                u[7:] if u.startswith("http://") else u
            c[(repo, d)] += 1
    keys = sorted(c)
    return pa.table({
        channel_col: pa.array([k[0] for k in keys], pa.string()),
        "domain": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([c[k] for k in keys], pa.int64()),
    })


def gopher_rules_batch(batch: pa.Table, *, text_col: str = "text",
                       min_words: int = 5, max_words: int = 10_000) -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, appendix A1.1)
    as exact integer-rational predicates — the published heuristic filter
    suite LLM data pipelines run before dedup:

    - word count in [min_words, max_words]
    - mean word length in [3, 10]    (as 3·n ≤ Σ|w| ≤ 10·n)
    - symbol-to-word ratio ≤ 0.1     (as 10·punct ≤ n)
    - ≥ 80% words contain a letter   (as 5·alpha ≥ 4·n; ASCII-letter
      variant — multilingual corpora swap in a Unicode class)
    - ≥ 2 distinct English stopwords present

    All-integer comparisons → bit-identical in the SQL mirror; emits one
    0/1 flag per rule plus the conjunction, so downstream can audit WHY a
    doc fell out (the operational need the boolean-only filter hides).
    Stateless Arrow batch kernel: streams, no shuffle."""
    import numpy as np

    texts = batch[text_col].to_pylist()
    n_toks, wchars, n_punct, n_alpha, n_stopd = [], [], [], [], []
    for t in texts:
        toks = (t or "").split()
        n_toks.append(len(toks))
        wchars.append(sum(len(w) for w in toks))
        n_punct.append(len(PUNCT_RE.findall(t or "")))
        n_alpha.append(sum(1 for w in toks if _ASCII_ALPHA_RE.search(w)))
        n_stopd.append(len({w for w in toks if w in STOPWORDS_EN}))
    n = np.asarray(n_toks, np.int64)
    wc = np.asarray(wchars, np.int64)
    pu = np.asarray(n_punct, np.int64)
    al = np.asarray(n_alpha, np.int64)
    st = np.asarray(n_stopd, np.int64)
    ok_words = ((n >= min_words) & (n <= max_words)).astype(np.int64)
    ok_mean = ((3 * n <= wc) & (wc <= 10 * n)).astype(np.int64)
    ok_symbol = (10 * pu <= n).astype(np.int64)
    ok_alpha = (5 * al >= 4 * n).astype(np.int64)
    ok_stop = (st >= 2).astype(np.int64)
    keep = ok_words * ok_mean * ok_symbol * ok_alpha * ok_stop
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n, pa.int64()),
        "ok_words": pa.array(ok_words, pa.int64()),
        "ok_mean_len": pa.array(ok_mean, pa.int64()),
        "ok_symbol": pa.array(ok_symbol, pa.int64()),
        "ok_alpha": pa.array(ok_alpha, pa.int64()),
        "ok_stop": pa.array(ok_stop, pa.int64()),
        "keep": pa.array(keep, pa.int64()),
    })


_ASCII_ALPHA_RE = re.compile(r"[A-Za-z]")
