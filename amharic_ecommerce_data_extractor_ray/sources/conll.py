"""CoNLL corpus I/O (S6/S7/S8/S9 in SURVEY.md §2.1).

Reader semantics mirror the reference whitespace variant
(/root/reference/src/utils/conll_parser.py:5-53) — the one the trainer and
pipeline actually use: blank-line sentence delimiting, any-whitespace field
split, strict exactly-2-fields validation (ValueError with file:line), missing
file → [] with a warning.  A ``delimiter`` flag covers the tab-only variant
(src/data_labeling/conll_parser.py:6-51).  Writer always emits tabs
(conll_parser.py:55-74).
"""

from __future__ import annotations

import os
import re
import warnings

_WS_SPLIT = re.compile(r"\s+")


def read_conll(file_path: str, *, delimiter: str | None = None
               ) -> list[list[tuple[str, str]]]:
    """Parse a CoNLL file → sentences of (token, label) pairs."""
    if not os.path.exists(file_path):
        warnings.warn(f"CoNLL file not found at {file_path}; returning []")
        return []
    sentences: list[list[tuple[str, str]]] = []
    current: list[tuple[str, str]] = []
    with open(file_path, encoding="utf-8") as f:
        for line_num, raw in enumerate(f, 1):
            line = raw.strip()
            if not line:
                if current:
                    sentences.append(current)
                    current = []
                continue
            parts = (line.split(delimiter) if delimiter
                     else _WS_SPLIT.split(line))
            if len(parts) != 2:
                raise ValueError(
                    f"Malformed CoNLL line at {file_path}:{line_num}: {line!r}")
            current.append((parts[0], parts[1]))
    if current:
        sentences.append(current)
    return sentences


def write_conll(sentences: list[list[tuple[str, str]]], file_path: str) -> None:
    out_dir = os.path.dirname(file_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(file_path, "w", encoding="utf-8") as f:
        for sent in sentences:
            for tok, label in sent:
                f.write(f"{tok}\t{label}\n")
            f.write("\n")


def conll_to_dataset(file_path: str, **read_kwargs):
    """CoNLL file → Dataset of (sentence_id, tokens:list<string>,
    labels:list<string>) — the Parquet-friendly eval-table schema."""
    import ray.data as rd

    sentences = read_conll(file_path, **read_kwargs)
    return rd.from_items([
        {"sentence_id": i,
         "tokens": [t for t, _ in sent],
         "labels": [l for _, l in sent]}
        for i, sent in enumerate(sentences)
    ])


def conll_to_rows(file_path: str) -> list[dict]:
    """CoNLL → flat rows joining tokens/labels with spaces (S9,
    conll_to_csv_converter.py:13-52 semantics: message_text = tokens joined,
    labels_sequence = labels joined)."""
    return [
        {"message_text": " ".join(t for t, _ in sent),
         "labels_sequence": " ".join(l for _, l in sent)}
        for sent in read_conll(file_path)
    ]


def label_vocabulary(file_path: str) -> list[str]:
    """Sorted distinct labels (G7, ner_trainer.py:104-107 — dynamic vocab,
    typos included)."""
    labels = set()
    for sent in read_conll(file_path):
        labels.update(l for _, l in sent)
    return sorted(labels)
