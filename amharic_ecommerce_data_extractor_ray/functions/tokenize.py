"""Tokenizers — exact reference semantics, precompiled for batches.

Two tokenizers exist in the reference and both are reproduced:

- ``tokenize_amharic_text`` — the pipeline tokenizer (M9,
  /root/reference/src/data_preprocessing/text_preprocessor.py:201-233):
  whitespace-normalize → pad punctuation listed in
  PUNCTUATION_CHARS_FOR_TOKENIZER (excludes ``#``, ``@``, ``_``) with spaces →
  split digit↔non-digit boundaries (``500ብር`` → ``500 ብር``) → split on space.
- ``tokenize_amharic_message`` — the labeling-path heuristic tokenizer (M14,
  /root/reference/src/data_labeling/pseudo_labeler.py:12-43): ``፦``→``:``,
  drop ``•``, ``\\b\\w+\\b|[.,;!?#@%/:-]`` findall, then compound splitting of
  ``550ብር`` / ``ዋጋ:-550`` / ``10x45`` forms.

Behavior is pinned by goldens captured from executing the reference.
"""

from __future__ import annotations

import re

# Reference constant (text_preprocessor.py:59): ASCII punctuation minus # @ _
# plus the Ethiopic marks.
PUNCTUATION_CHARS_FOR_TOKENIZER = "!\"$%&'()*+,-./:;<=>?[\\]^`{|}~" + "።፣፤፧፡፦"

_WS = re.compile(r"\s+")
_PUNCT_PAD = re.compile("([" + re.escape(PUNCTUATION_CHARS_FOR_TOKENIZER) + "])")
_DIGIT_THEN_NONDIGIT = re.compile(r"(\d)([^\d\s])")
_NONDIGIT_THEN_DIGIT = re.compile(r"([^\d\s])(\d)")


def tokenize_amharic_text(text: str | None) -> list[str]:
    """Pipeline tokenizer (M9). None → []."""
    if text is None:
        return []
    s = _WS.sub(" ", text).strip()
    s = _PUNCT_PAD.sub(r" \1 ", s)
    s = _DIGIT_THEN_NONDIGIT.sub(r"\1 \2", s)
    s = _NONDIGIT_THEN_DIGIT.sub(r"\1 \2", s)
    s = _WS.sub(" ", s).strip()
    return [t for t in s.split(" ") if t]


_WORD_OR_PUNCT = re.compile(r"\b\w+\b|[.,;!?#@%/:-]")
_PRICE_SPLIT = re.compile(r"[:\-]")


def tokenize_amharic_message(message: str) -> list[str]:
    """Labeling-path tokenizer (M14) — same compound-splitting cascade as the
    reference: ብር-suffixed amounts, ዋጋ:-N forms, NxM dimensions."""
    message = message.replace("፦", ":").replace("•", "")
    out: list[str] = []
    for tok in _WORD_OR_PUNCT.findall(message):
        if "ብር" in tok and len(tok) > 2:
            head, _, _ = tok.partition("ብር")
            if head:
                out.append(head)
            out.append("ብር")
        elif "ዋጋ" in tok and ":" in tok:
            parts = _PRICE_SPLIT.split(tok)
            out.append(parts[0])
            out.extend(p for p in parts[1:] if p)
        elif "x" in tok and (
            tok.replace("x", "").isdigit()
            or any(c.isalpha() for c in tok.replace("x", ""))
        ):
            # reference keeps only the first two 'x'-separated parts
            parts = tok.split("x")
            out.append(parts[0])
            out.append("x")
            if parts[1]:
                out.append(parts[1])
        else:
            out.append(tok)
    return [t for t in out if t.strip()]
