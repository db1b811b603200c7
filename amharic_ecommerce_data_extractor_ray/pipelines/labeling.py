"""Labeling-loop pipelines (S8/S9/S10, M14/M15 — SURVEY.md §3.3).

- ``prepare_labeling_sheet``: first N messages → tokenize → ``token\\tO``
  skeleton (S10; implemented against the real tokenizer signature — the
  reference version crashes on a nonexistent kwarg,
  prepare_data_for_labeling.py:70).
- ``pseudo_label_texts``: message text → M14 tokenize → heuristic BIO tags →
  CoNLL sentences (the reference's pseudo_label_file loop,
  pseudo_labeler.py:160-198, as two map_batches stages).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.tagger import HeuristicTagger
from ..functions.tokenize import tokenize_amharic_message, tokenize_amharic_text
from ..sources.conll import write_conll

_TAGGER = HeuristicTagger()


def prepare_labeling_sheet(messages_ds, out_path: str, *, num_messages: int = 50,
                           text_col: str = "content") -> int:
    """S10/O2: ``ds.limit(n)`` → tokenize → CoNLL skeleton with all-O labels.
    Returns the number of sentences written (driver-side write; the sheet is
    small by construction)."""
    rows = messages_ds.limit(num_messages).select_columns([text_col]).take_all()
    sentences = []
    for r in rows:
        toks = tokenize_amharic_text(r[text_col] or "")
        if toks:
            sentences.append([(t, "O") for t in toks])
    write_conll(sentences, out_path)
    return len(sentences)


def pseudo_label_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """M14 + M15 as one vectorized stage: text → heuristic-tokenized →
    pseudo-labeled (tag tokens + labels as list columns)."""
    texts = batch[text_col].to_pylist()
    toks_out, labs_out = [], []
    for t in texts:
        cleaned = " ".join((t or "").split())
        pairs = _TAGGER.tag(tokenize_amharic_message(cleaned))
        toks_out.append([p[0] for p in pairs])
        labs_out.append([p[1] for p in pairs])
    return (batch
            .append_column("pl_tokens", pa.array(toks_out, pa.list_(pa.string())))
            .append_column("pl_labels", pa.array(labs_out, pa.list_(pa.string()))))


def pseudo_label_to_conll(messages_ds, out_path: str, *,
                          text_col: str = "content") -> int:
    """Full labeling loop → CoNLL file (empty messages skipped, mirroring
    pseudo_labeler.py:179-180)."""
    labeled = messages_ds.map_batches(
        lambda b: pseudo_label_batch(b, text_col=text_col),
        batch_format="pyarrow")
    sentences = []
    for b in labeled.iter_batches(batch_format="pyarrow"):
        for toks, labs in zip(b["pl_tokens"].to_pylist(),
                              b["pl_labels"].to_pylist()):
            if toks:
                sentences.append(list(zip(toks, labs)))
    write_conll(sentences, out_path)
    return len(sentences)
