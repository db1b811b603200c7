"""Amharic text normalization — exact reference semantics, engineered for batches.

Reimplements the normalization chain of the reference preprocess module
(/root/reference/src/data_preprocessing/text_preprocessor.py:62-274) from
scratch.  The reference applies, per string, a cascade of *sequential*
``str.replace`` passes over hand-sorted maps plus uncompiled regex subs; we
precompute the fixed point of each sequential replace cascade into a single
``str.translate`` table (one pass per string) and precompile every regex once
at import.  Behavior is bit-identical — pinned by golden fixtures captured by
executing the reference (see scripts/capture_goldens.py and FIXTURES.md §3).

Semantics preserved exactly, including the sharp edges:
- fidel unification map with chained entries (``ሓ``→``ሃ``→``ሀ`` because the
  ``ሃ``→``ሀ`` pass runs *after* the ``ሓ``→``ሃ`` pass; conversely ``ሧ``→``ሠ``
  stays ``ሠ`` because ``ሠ``→``ሰ`` ran *before*) — text_preprocessor.py:70-80
- naive Geez numeral concatenation, no positional arithmetic
  (``፻፳፭`` → ``"100205"``) — text_preprocessor.py:82-94
- ``!`` → ``.``; Ethiopic punctuation → ASCII; identical-run collapse; the
  punct-ws-punct collapse with its embedded ``.strip()`` —
  text_preprocessor.py:96-128
- URL/@mention/#hashtag → single space — text_preprocessor.py:130-144
- chars outside [Ethiopic | printable-ASCII | whitespace] → space —
  text_preprocessor.py:146-159
- substring (not token) stopword removal, longest-first, IGNORECASE, off by
  default — text_preprocessor.py:175-198
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable

# --- Lexicons (values mirror the reference constants; see
# text_preprocessor.py:17-59) -------------------------------------------------

AMHARIC_CHAR_MAP: dict[str, str] = {
    "ሐ": "ሀ", "ሑ": "ሁ", "ሒ": "ሂ", "ሓ": "ሃ", "ሔ": "ሄ", "ሕ": "ህ", "ሖ": "ሆ",
    "ኀ": "ሀ", "ኁ": "ሁ", "ኂ": "ሂ", "ኃ": "ሃ", "ኄ": "ሄ", "ኅ": "ህ", "ኆ": "ሆ",
    "ሠ": "ሰ", "ሡ": "ሱ", "ሢ": "ሲ", "ሣ": "ሳ", "ሤ": "ሴ", "ሥ": "ስ", "ሦ": "ሶ",
    "ሧ": "ሠ",
    "ዐ": "አ", "ዑ": "ኡ", "ዒ": "ኢ", "ዓ": "ኣ", "ዔ": "ኤ", "ዕ": "እ", "ዖ": "ኦ",
    "ጸ": "ፀ", "ጹ": "ፁ", "ጺ": "ፂ", "ጻ": "ፃ", "ጼ": "ፄ", "ጽ": "ፅ", "ጾ": "ፆ",
    "ሃ": "ሀ",
    "ኋ": "ሐ",
    "ፅ": "ጽ",
}

AMHARIC_NUMERAL_MAP: dict[str, str] = {
    "፩": "1", "፪": "2", "፫": "3", "፬": "4", "፭": "5",
    "፮": "6", "፯": "7", "፰": "8", "፱": "9", "፰፻": "100",
    "፲": "10", "፳": "20", "፴": "30", "፵": "40", "፶": "50",
    "፷": "60", "፸": "70", "፹": "80", "፺": "90", "፻": "100", "፼": "10000",
}

AMHARIC_STOP_WORDS: frozenset[str] = frozenset({
    "ነው", "እና", "የ", "አለ", "ውስጥ", "ላይ", "ጋር", "ወደ", "ከ", "አንድ", "ሁለት",
    "ሶስት", "አራት", "አምስት", "ስድስት", "ሰባት", "ስምንት", "ዘጠኝ", "አስር",
    "ብር", "ክፍያ", "አድራሻ", "ቁጥር", "ፎቅ", "ቢሮ", "ይህ", "ያለ",
    "ነው።", "ነው.", "የ.",
    "።", ",", ".", "?", "!", ":", ";", "-", "፣", "፤", "፧", "፡", "፦",
})


def _sequential_replace_closure(mapping: dict[str, str]) -> dict[int, str]:
    """Fold a *sequential* single-char replace cascade into one translate table.

    The reference loops ``for old, new in sorted_by_len_desc(items): text =
    text.replace(old, new)``; a char produced by an early pass is re-replaced
    by any *later* pass whose key it matches.  We simulate that chain per
    input char so one ``str.translate`` is exactly equivalent.
    """
    items = sorted(mapping.items(), key=lambda kv: len(kv[0]), reverse=True)
    single = [(k, v) for k, v in items if len(k) == 1]
    table: dict[int, str] = {}
    for idx, (src, _) in enumerate(single):
        cur = single[idx][1]
        # Re-apply every later pass to the current (possibly multi-char) value.
        for later_src, later_dst in single[idx + 1:]:
            cur = cur.replace(later_src, later_dst)
        table[ord(src)] = cur
    return table


_CHAR_TABLE = _sequential_replace_closure(AMHARIC_CHAR_MAP)
_NUMERAL_TABLE = _sequential_replace_closure(AMHARIC_NUMERAL_MAP)
# Multi-char numeral keys (only "፰፻") must run before the translate pass,
# mirroring the reference's longest-key-first ordering.
_NUMERAL_MULTI = [(k, v) for k, v in sorted(AMHARIC_NUMERAL_MAP.items(),
                                            key=lambda kv: len(kv[0]),
                                            reverse=True) if len(k) > 1]

# Ethiopic→ASCII punctuation plus "!"→"." — all 1:1, no key/value chaining,
# so a single translate equals the reference's replace sequence
# (text_preprocessor.py:106-112).
_PUNCT_TABLE = str.maketrans({
    "።": ".", "፣": ",", "፤": ";", "፧": "?", "፡": ":", "፦": "-", "!": ".",
})

_RUN_COLLAPSE = [
    (re.compile(r"\.{2,}"), "."),
    (re.compile(r"\?{2,}"), "?"),
    (re.compile(r"!{2,}"), "!"),
    (re.compile(r",{2,}"), ","),
    (re.compile(r";{2,}"), ";"),
    (re.compile(r":{2,}"), ":"),
    (re.compile(r"-{2,}"), "-"),
]
_PUNCT_PAIR = re.compile(r"([.?!,;:\-]+)\s*([.?!,;:\-]+)")

_URL = re.compile(r"https?://\S+|www\.\S+")
_MENTION = re.compile(r"@\w+")
_HASHTAG = re.compile(r"#\w+")
_NON_AMHARIC_NON_ASCII = re.compile(r"[^ሀ-፿ -~\s]+")
_WS = re.compile(r"\s+")

_STOPWORD_PATTERNS = [
    re.compile(re.escape(w), re.IGNORECASE)
    for w in sorted(AMHARIC_STOP_WORDS, key=len, reverse=True)
]


# --- Scalar functions (each mirrors one reference function) ------------------

def apply_unicode_normalization(text: str | None) -> str:
    """NFC normalization (text_preprocessor.py:62-68)."""
    if text is None:
        return ""
    return unicodedata.normalize("NFC", text)


def replace_amharic_characters(text: str | None) -> str:
    """Fidel unification (text_preprocessor.py:70-80), single-pass closure."""
    if text is None:
        return ""
    return text.translate(_CHAR_TABLE)


def normalize_amharic_numerals(text: str | None) -> str:
    """Geez→Arabic digit substitution, naive concatenation
    (text_preprocessor.py:82-94)."""
    if text is None:
        return ""
    for key, val in _NUMERAL_MULTI:
        if key in text:
            text = text.replace(key, val)
    return text.translate(_NUMERAL_TABLE)


def normalize_punctuation(text: str | None) -> str:
    """Punctuation standardization + run collapse (text_preprocessor.py:96-128).

    Note the reference's punct-ws-punct collapse carries an embedded
    ``.strip()`` (line 126) — preserved here.
    """
    if text is None:
        return ""
    text = text.translate(_PUNCT_TABLE)
    for pat, rep in _RUN_COLLAPSE:
        text = pat.sub(rep, text)
    return _PUNCT_PAIR.sub(r"\1", text).strip()


def remove_urls_mentions_hashtags(text: str | None) -> str:
    """URLs, @mentions, #hashtags → single space (text_preprocessor.py:130-144)."""
    if text is None:
        return ""
    text = _URL.sub(" ", text)
    text = _MENTION.sub(" ", text)
    return _HASHTAG.sub(" ", text)


def remove_emojis_and_non_amharic_non_ascii(text: str | None) -> str:
    """Chars outside Ethiopic/printable-ASCII/whitespace → space
    (text_preprocessor.py:146-159)."""
    if text is None:
        return ""
    return _NON_AMHARIC_NON_ASCII.sub(" ", text)


def remove_extra_whitespace(text: str | None) -> str:
    """Collapse all whitespace runs, trim (text_preprocessor.py:161-172)."""
    if text is None:
        return ""
    return _WS.sub(" ", text).strip()


def remove_amharic_stopwords(text: str | None) -> str:
    """Substring stopword removal, longest-first, IGNORECASE
    (text_preprocessor.py:175-198). Off by default in the pipeline."""
    if text is None:
        return ""
    for pat in _STOPWORD_PATTERNS:
        text = pat.sub(" ", text)
    return remove_extra_whitespace(text)


def preprocess_amharic_text(text: object, remove_stopwords: bool = False) -> str:
    """Full normalization chain (text_preprocessor.py:237-274).

    Accepts any scalar; None/NaN → "". Composition order is fixed:
    NFC → fidel map → numerals → strip URLs/mentions/hashtags → strip
    non-Amharic-non-ASCII → punctuation → whitespace → (optional) stopwords.
    """
    if text is None or text != text:  # None or float('nan')
        return ""
    s = str(text)
    s = unicodedata.normalize("NFC", s)
    s = s.translate(_CHAR_TABLE)
    for key, val in _NUMERAL_MULTI:
        if key in s:
            s = s.replace(key, val)
    s = s.translate(_NUMERAL_TABLE)
    s = _URL.sub(" ", s)
    s = _MENTION.sub(" ", s)
    s = _HASHTAG.sub(" ", s)
    s = _NON_AMHARIC_NON_ASCII.sub(" ", s)
    s = s.translate(_PUNCT_TABLE)
    for pat, rep in _RUN_COLLAPSE:
        s = pat.sub(rep, s)
    s = _PUNCT_PAIR.sub(r"\1", s).strip()
    s = _WS.sub(" ", s).strip()
    if remove_stopwords:
        for pat in _STOPWORD_PATTERNS:
            s = pat.sub(" ", s)
        s = _WS.sub(" ", s).strip()
    return s


def preprocess_batch(texts: Iterable[object], remove_stopwords: bool = False) -> list[str]:
    """Vectorization point for map_batches: normalize a batch of strings.

    A tight loop over the compiled scalar function; every table/regex is
    module-level so per-batch setup cost is zero.
    """
    fn = preprocess_amharic_text
    return [fn(t, remove_stopwords) for t in texts]
