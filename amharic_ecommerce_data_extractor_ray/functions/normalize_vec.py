"""Arrow-vectorized normalization + tokenize-prepare (C++ re2 kernels).

Column-at-a-time variants of functions/normalize.py (M1-M10) and the string
transforms of functions/tokenize.py (M9) built on pyarrow.compute: one
re2/`replace_substring` pass per rule over the whole StringArray — no Python
objects in the hot path.  Used by the fused KG kernels; the scalar functions
remain the semantic reference.

Equivalence with the scalar path (and therefore with the executed reference)
is pinned by tests/test_differential_fuzz.py::test_vectorized_*, the golden
fixtures, and the DuckDB oracle gate.  Two translation subtleties:

- Python's ``\\s`` / ``\\w`` are Unicode-aware; re2's are ASCII.  We emulate:
  ``\\s`` → ``[\\t-\\r \\x1c-\\x1f\\x85\\p{Z}]`` (the characters
  ``str.isspace()`` accepts), ``\\w`` → ``[\\p{L}\\p{N}_]``.
- The reference's char/numeral maps are applied as *sequential* replace
  passes (longest key first), so we issue the same sequence of
  ``replace_substring`` calls — a value produced by an early pass is
  re-replaced only by later passes, exactly like the reference loop
  (text_preprocessor.py:70-94).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .normalize import AMHARIC_CHAR_MAP, AMHARIC_NUMERAL_MAP
from .tokenize import PUNCTUATION_CHARS_FOR_TOKENIZER

# Python-\s equivalent for re2 (see module docstring)
PYWS = r"\t-\r \x1c-\x1f\x85\p{Z}"
# Python-\w equivalent for re2
PYW = r"\p{L}\p{N}_"

_CHAR_PASSES = sorted(AMHARIC_CHAR_MAP.items(),
                      key=lambda kv: len(kv[0]), reverse=True)
_NUMERAL_PASSES = sorted(AMHARIC_NUMERAL_MAP.items(),
                         key=lambda kv: len(kv[0]), reverse=True)
_PUNCT_PASSES = [("።", "."), ("፣", ","), ("፤", ";"), ("፧", "?"), ("፡", ":"),
                 ("፦", "-"), ("!", ".")]
_RUN_PASSES = [(r"\.{2,}", "."), (r"\?{2,}", "?"), (r"!{2,}", "!"),
               (r",{2,}", ","), (r";{2,}", ";"), (r":{2,}", ":"),
               (r"-{2,}", "-")]

_URL = rf"https?://[^{PYWS}]+|www\.[^{PYWS}]+"
_MENTION = rf"@[{PYW}]+"
_HASHTAG = rf"#[{PYW}]+"
_NON_AMH = rf"[^ሀ-፿ -~{PYWS}]+"
_PAIR = rf"([.?!,;:\-]+)[{PYWS}]*([.?!,;:\-]+)"
_WS_RUN = rf"[{PYWS}]+"

_rr = pc.replace_substring_regex
_rs = pc.replace_substring


def normalize_array(arr) -> pa.Array:
    """Vectorized preprocess_amharic_text(text, remove_stopwords=False).

    NFC runs through Python's unicodedata: this build's
    ``pc.utf8_normalize`` decomposes regardless of the requested form
    (measured: É → E+U+0301 for form="NFC"), so it cannot be used.  The
    per-row cost is one C call; every regex/replace pass after it is an
    Arrow kernel."""
    import unicodedata

    texts = arr.to_pylist() if not isinstance(arr, list) else arr
    nfc = [unicodedata.normalize("NFC", t) if t else "" for t in texts]
    return normalize_array_post_nfc(pa.array(nfc, pa.string()))


def normalize_array_post_nfc(a) -> pa.Array:
    """The Arrow-kernel tail of the normalize chain (everything after NFC).
    Callers that already hold NFC python strings (e.g. the fused KG kernel,
    which materializes content for sha256 anyway) enter here."""
    for src, dst in _CHAR_PASSES:
        a = _rs(a, pattern=src, replacement=dst)
    for src, dst in _NUMERAL_PASSES:
        a = _rs(a, pattern=src, replacement=dst)
    a = _rr(a, pattern=_URL, replacement=" ")
    a = _rr(a, pattern=_MENTION, replacement=" ")
    a = _rr(a, pattern=_HASHTAG, replacement=" ")
    a = _rr(a, pattern=_NON_AMH, replacement=" ")
    for src, dst in _PUNCT_PASSES:
        a = _rs(a, pattern=src, replacement=dst)
    for pat, rep in _RUN_PASSES:
        a = _rr(a, pattern=pat, replacement=rep)
    a = _rr(a, pattern=_PAIR, replacement=r"\1")
    a = pc.utf8_trim_whitespace(a)
    a = _rr(a, pattern=_WS_RUN, replacement=" ")
    return pc.utf8_trim_whitespace(a)


_PUNCT_CLASS = ("[" + "".join(
    "\\" + c if c in r"\^]-[" else c for c in PUNCTUATION_CHARS_FOR_TOKENIZER
) + "]")
_DIGIT_NONDIGIT = rf"(\d)([^\d{PYWS}])"
_NONDIGIT_DIGIT = rf"([^\d{PYWS}])(\d)"


def tokenize_prepare_array(norm_arr) -> pa.Array:
    """Vectorized M9 up to (but not including) the final split: whitespace
    collapse → punctuation padding → digit-boundary splits → collapse/trim.
    ``result.split(' ')`` per row (dropping empties) equals
    tokenize_amharic_text(norm)."""
    a = pc.fill_null(pc.cast(norm_arr, pa.string()), "")
    a = pc.utf8_trim_whitespace(_rr(a, pattern=_WS_RUN, replacement=" "))
    a = _rr(a, pattern=f"({_PUNCT_CLASS})", replacement=r" \1 ")
    a = _rr(a, pattern=_DIGIT_NONDIGIT, replacement=r"\1 \2")
    a = _rr(a, pattern=_NONDIGIT_DIGIT, replacement=r"\1 \2")
    a = pc.utf8_trim_whitespace(_rr(a, pattern=_WS_RUN, replacement=" "))
    return a


def tokens_from_prepared(prepared: str) -> list[str]:
    """Final split of a prepared string (cheap; done row-wise where the
    consumer needs Python lists anyway, e.g. the tagger)."""
    return [t for t in prepared.split(" ") if t]
