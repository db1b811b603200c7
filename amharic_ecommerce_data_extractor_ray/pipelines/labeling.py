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
    """S10/O2: ``ds.limit(n)`` → normalize → tokenize → CoNLL skeleton with
    all-O labels.  Returns the number of sentences written (driver-side write;
    the sheet is small by construction).

    The reference function is latently broken (passes a nonexistent
    ``return_tokens`` kwarg, prepare_data_for_labeling.py:70); its evident
    intent — preprocess then tokenize, as preprocess_dataframe does — is what
    we implement."""
    from ..functions.normalize import preprocess_amharic_text

    rows = messages_ds.limit(num_messages).select_columns([text_col]).take_all()
    sentences = []
    for r in rows:
        toks = tokenize_amharic_text(preprocess_amharic_text(r[text_col]))
        if toks:
            sentences.append([(t, "O") for t in toks])
    write_conll(sentences, out_path)
    return len(sentences)


def labeling_sheet_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """S10 as a flat table: one row per token — (message_id, tok_idx, token,
    label='O').  Empty messages contribute no rows."""
    from ..functions.normalize import preprocess_amharic_text

    mids = batch["message_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    out_mid, out_idx, out_tok = [], [], []
    for mid, t in zip(mids, texts):
        for i, tok in enumerate(tokenize_amharic_text(preprocess_amharic_text(t))):
            out_mid.append(mid)
            out_idx.append(i)
            out_tok.append(tok)
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "tok_idx": pa.array(out_idx, pa.int64()),
        "token": pa.array(out_tok, pa.string()),
        "label": pa.array(["O"] * len(out_tok), pa.string()),
    })


def bio_tags_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """Pipeline-path BIO tags as a flat token table: (message_id, tok_idx,
    token, label) via normalize → M9 tokenize → heuristic tag — the
    token-level prediction table of the reference (model_evaluator.py:199-215)
    without the blank-separator-row presentation artifact."""
    from ..stages.enrich import _tag_rows

    mids = batch["message_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    out_mid, out_idx, out_tok, out_lab = [], [], [], []
    for mid, pairs in zip(mids, _tag_rows(texts)):
        for i, (tok, lab) in enumerate(pairs):
            out_mid.append(mid)
            out_idx.append(i)
            out_tok.append(tok)
            out_lab.append(lab)
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "tok_idx": pa.array(out_idx, pa.int64()),
        "token": pa.array(out_tok, pa.string()),
        "label": pa.array(out_lab, pa.string()),
    })


def conll_csv_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """S9 (conll_to_csv_converter.py:13-52) over the labeling loop: each
    non-empty message → (message_id, message_text, labels_sequence) with
    space-joined M14 tokens / BIO labels."""
    labeled = pseudo_label_batch(batch, text_col=text_col)
    mids = labeled["message_id"].to_pylist()
    toks = labeled["pl_tokens"].to_pylist()
    labs = labeled["pl_labels"].to_pylist()
    out_mid, out_text, out_labs = [], [], []
    for mid, t, l in zip(mids, toks, labs):
        if t:
            out_mid.append(mid)
            out_text.append(" ".join(t))
            out_labs.append(" ".join(l))
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "message_text": pa.array(out_text, pa.string()),
        "labels_sequence": pa.array(out_labs, pa.string()),
    })


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
