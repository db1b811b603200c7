"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All stateless vectorized map_batches stages; every
formula is integer/regex arithmetic both Python and DuckDB can evaluate
identically (see the oracle SQL), except the rolling-hash fingerprint (not
SQL-expressible → rows-only check).
"""

from __future__ import annotations

import re

import pyarrow as pa

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
