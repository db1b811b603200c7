"""Differential fuzzing vs the EXECUTED reference implementation.

Property-based parity: on randomized strings drawn from the full trouble
alphabet (fidel variants, Geez numerals, Ethiopic punctuation, URLs,
mentions, hashtags, emoji, digits glued to words), the engine's normalize /
tokenize / tagger must agree byte-for-byte with the reference functions at
/root/reference.  This extends the 12-template goldens to an open input
space."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "src")),
                                reason="reference repo not present")


def _ref_funcs():
    sys.path.insert(0, REF)
    try:
        from src.data_labeling.pseudo_labeler import (pseudo_label_message,
                                                      tokenize_amharic_message)
        from src.data_preprocessing.text_preprocessor import (
            preprocess_amharic_text, tokenize_amharic_text)
    finally:
        sys.path.remove(REF)
    return (preprocess_amharic_text, tokenize_amharic_text,
            tokenize_amharic_message, pseudo_label_message)


(REF_NORM, REF_TOK, REF_M14, REF_TAG) = _ref_funcs()

# Alphabet chosen to fire every normalize rule and tagger rule.
ATOMS = st.sampled_from([
    "ሐ", "ኂ", "ሣ", "ዔ", "ጺ", "ሃ", "ኋ", "ፅ", "ሀ", "ለ", "መ", "ቤት",   # fidel
    "፩", "፪", "፻", "፼", "፲", "፰፻",                                    # Geez
    "።", "፣", "፤", "፧", "፡", "፦", "!", "?", ".", ",", ":", "-", ";",   # punct
    "ዋጋ", "ዋጋ፦", "ብር", "birr", "ETB", "550", "1,200", "3.5",          # price
    "መገናኛ", "ሞል", "ፎቅ", "ቢሮ", "ቁ.2", "ለቡ",                        # location
    "blender", "stove", "silicon", "ማሽን", "እቃ", "ምርጥ",               # product
    "@Vendor1", "#ቅናሽ", "#new_item", "https://t.me/x", "www.a.com",
    "😊", "🔥", "½", "É",                                               # strip
    "500ብር", "10x45", "0911234567", "+2519",
    # round-2 template vocabulary (long-post forms)
    "air", "fryer", "HEPA", "1.8L", "ማሳጅ", "መደርደሪያ", "፲፻", "፪፻፶",
    "ዋጋ:-", "price-", "ቤተ/ክርስቲያን", "መዳህኒዓለም", "0944 55 66 77",
    "rack", "ብር።", "ብር፤", "ታሜ", "ህንፃ",
    " ", "  ", "\t", "\n", "",
])
TEXTS = st.lists(ATOMS, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_normalize_tokenize_parity(text):
    from amharic_ecommerce_data_extractor_ray.functions.normalize import preprocess_amharic_text
    from amharic_ecommerce_data_extractor_ray.functions.tokenize import tokenize_amharic_text

    ref_n = REF_NORM(text, remove_stopwords=False)
    assert preprocess_amharic_text(text, False) == ref_n
    assert tokenize_amharic_text(ref_n) == REF_TOK(ref_n)


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_stopword_variant_parity(text):
    from amharic_ecommerce_data_extractor_ray.functions.normalize import preprocess_amharic_text

    assert (preprocess_amharic_text(text, True)
            == REF_NORM(text, remove_stopwords=True))


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_tagger_parity(text):
    from amharic_ecommerce_data_extractor_ray.functions.tagger import HeuristicTagger
    from amharic_ecommerce_data_extractor_ray.functions.tokenize import (
        tokenize_amharic_message, tokenize_amharic_text)

    # pipeline path: M9 tokens
    toks = REF_TOK(REF_NORM(text, remove_stopwords=False))
    ref = [(d["text"], d["label"]) for d in REF_TAG(toks)]
    assert HeuristicTagger().tag(toks) == ref
    # labeling path: M14 tokens over whitespace-cleaned raw
    cleaned = " ".join(text.split())
    assert tokenize_amharic_message(cleaned) == REF_M14(cleaned)
    m14_toks = REF_M14(cleaned)
    ref14 = [(d["text"], d["label"]) for d in REF_TAG(m14_toks)]
    assert HeuristicTagger().tag(m14_toks) == ref14


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_vectorized_normalize_tokenize_parity(texts):
    """The Arrow re2 kernel path (functions/normalize_vec) is bit-identical
    to the scalar chain — and therefore to the reference — column-wise."""
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.functions.normalize_vec import (
        normalize_array, tokenize_prepare_array, tokens_from_prepared)

    vec_norm = normalize_array(pa.array(texts, pa.string())).to_pylist()
    assert vec_norm == [REF_NORM(t, remove_stopwords=False) for t in texts]
    prepared = tokenize_prepare_array(pa.array(vec_norm, pa.string())).to_pylist()
    assert ([tokens_from_prepared(p) for p in prepared]
            == [REF_TOK(n) for n in vec_norm])


def test_vectorized_parity_on_random_unicode():
    """Scalar vs Arrow-kernel parity on arbitrary Unicode (exotic whitespace,
    emoji, unassigned ranges) — beyond the structured atom alphabet."""
    import random

    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.functions.normalize import preprocess_amharic_text
    from amharic_ecommerce_data_extractor_ray.functions.normalize_vec import normalize_array
    from amharic_ecommerce_data_extractor_ray.functions.normalize_vec import (
        tokenize_prepare_array, tokens_from_prepared)
    from amharic_ecommerce_data_extractor_ray.functions.tokenize import tokenize_amharic_text

    rng = random.Random(123)

    def rand_text():
        chars = []
        for _ in range(rng.randint(0, 40)):
            r = rng.random()
            if r < 0.3:
                cp = rng.randint(0x1200, 0x137F)
            elif r < 0.5:
                cp = rng.randint(0x20, 0x7E)
            elif r < 0.65:
                cp = rng.choice([0xA0, 0x85, 0x2028, 0x2029, 0x180E, 0x200B,
                                 0x3000, 0x1680, 0x2007, 0x202F, 0xFEFF])
            elif r < 0.8:
                cp = rng.randint(0x80, 0x2FFF)
            else:
                cp = rng.randint(0x1F300, 0x1F6FF)
            chars.append(chr(cp))
        return "".join(chars)

    texts = [rand_text() for _ in range(1000)]
    refs = [preprocess_amharic_text(t, False) for t in texts]
    assert normalize_array(pa.array(texts, pa.string())).to_pylist() == refs
    prepared = tokenize_prepare_array(pa.array(refs, pa.string())).to_pylist()
    assert ([tokens_from_prepared(p) for p in prepared]
            == [tokenize_amharic_text(n) for n in refs])
