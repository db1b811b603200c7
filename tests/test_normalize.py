"""Normalization chain — golden pairs measured from the reference
(FIXTURES.md §3) plus full-template differential goldens (goldens.py)."""

from amharic_ecommerce_data_extractor_ray import goldens
from amharic_ecommerce_data_extractor_ray.functions import normalize as nz
from amharic_ecommerce_data_extractor_ray.sources.corpus import TEMPLATES

GOLDEN_PAIRS = [
    (
        "ጤና ይስጥልኝ! ዋጋው ፻፳፭ ብር ነው። አድራሻችን መገናኛ ስሪ ኤም ሲቲ ሞል ነው። "
        "@Shageronlinestore #ቅናሽ 😊 https://t.me/example_product",
        "ጤና ይስጥልኝ. ዋጋው 100205 ብር ነው. አድራሻችን መገናኛ ስሪ ኤም ሲቲ ሞል ነው.",
    ),
    ("ሃሎ ኋይት ሧት ፅናት", "ሀሎ ሐይት ሠት ጽናት"),
    ("ዋጋ፦500ብር።", "ዋጋ-500ብር."),
    ("Hello World! ዋጋ: 1000 ብር. #አዲስ_እቃ @AmharicStore", "Hello World. ዋጋ: 1000 ብር."),
    (
        "Dell laptop ዋጋ 25000 ETB አድራሻ ቦሌ +251911123456",
        "Dell laptop ዋጋ 25000 ETB አድራሻ ቦሌ +251911123456",
    ),
    ("", ""),
]


def test_golden_pairs_from_fixtures():
    for raw, expected in GOLDEN_PAIRS:
        assert nz.preprocess_amharic_text(raw) == expected


def test_none_and_nan_inputs():
    assert nz.preprocess_amharic_text(None) == ""
    assert nz.preprocess_amharic_text(float("nan")) == ""
    assert nz.apply_unicode_normalization(None) == ""
    assert nz.replace_amharic_characters(None) == ""
    assert nz.normalize_amharic_numerals(None) == ""
    assert nz.normalize_punctuation(None) == ""
    assert nz.remove_extra_whitespace(None) == ""


def test_geez_numerals_concatenate_not_arithmetic():
    # ፻=100 ፳=20 ፭=5 → "100205", NOT 125 (text_preprocessor.py:82-94 quirk)
    assert nz.normalize_amharic_numerals("፻፳፭") == "100205"
    assert nz.normalize_amharic_numerals("፰፻") == "100"  # multi-char key first


def test_char_map_sequential_chains():
    # ሓ→ሃ then the later ሃ→ሀ pass applies: final ሀ
    assert nz.replace_amharic_characters("ሓ") == "ሀ"
    # ሧ→ሠ but ሠ→ሰ ran earlier: stays ሠ
    assert nz.replace_amharic_characters("ሧ") == "ሠ"
    # ጽ→ፅ then ፅ→ጽ round-trips back
    assert nz.replace_amharic_characters("ጽ") == "ጽ"
    assert nz.replace_amharic_characters("ፅ") == "ጽ"


def test_punctuation_normalization():
    assert nz.normalize_punctuation("ሀ።።።") == "ሀ."
    assert nz.normalize_punctuation("እቃ!!!") == "እቃ."
    # adjacent-punct collapse: ":-" → ":" (two punct groups, empty \s* between)
    assert nz.normalize_punctuation("ዋጋ፡- ፭") == "ዋጋ: ፭"
    # the embedded .strip() at text_preprocessor.py:126 trims the whole string
    assert nz.normalize_punctuation("  ሀ. ") == "ሀ."


def test_urls_mentions_hashtags_removed():
    s = nz.preprocess_amharic_text("ሀ https://t.me/x @user #tag www.x.com ለ")
    assert s == "ሀ ለ"


def test_emoji_and_foreign_chars_removed():
    assert nz.preprocess_amharic_text("ሀ 😊 ለ") == "ሀ ለ"
    assert nz.preprocess_amharic_text("ሀ中文ለ") == "ሀ ለ"


def test_stopword_removal_is_substring_based():
    # የቤት contains stopword የ → ቤት (substring semantics, M8)
    out = nz.remove_amharic_stopwords("የቤት እቃ")
    assert "የ" not in out
    assert "ቤት" in out
    # default path leaves stopwords in place
    assert "ነው" in nz.preprocess_amharic_text("እቃ ነው ጥሩ")


def test_all_templates_match_reference_goldens():
    for raw, expected in zip(TEMPLATES, goldens.NORM):
        assert nz.preprocess_amharic_text(raw) == expected


def test_preprocess_batch_matches_scalar():
    assert nz.preprocess_batch(TEMPLATES) == goldens.NORM
