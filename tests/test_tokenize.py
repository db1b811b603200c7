"""Tokenizers (M9 pipeline tokenizer, M14 labeling tokenizer) vs goldens."""

from amharic_ecommerce_data_extractor_ray import goldens
from amharic_ecommerce_data_extractor_ray.functions import tokenize as tk
from amharic_ecommerce_data_extractor_ray.sources.corpus import TEMPLATES


def test_pipeline_tokenizer_goldens():
    for norm, expected in zip(goldens.NORM, goldens.TOKENS):
        assert tk.tokenize_amharic_text(norm) == expected


def test_digit_boundary_splitting():
    assert tk.tokenize_amharic_text("500ብር") == ["500", "ብር"]
    assert tk.tokenize_amharic_text("ብር500") == ["ብር", "500"]
    assert tk.tokenize_amharic_text("ዋጋ-550ብር.") == ["ዋጋ", "-", "550", "ብር", "."]


def test_hash_at_underscore_stay_attached():
    # '#', '@', '_' excluded from PUNCTUATION_CHARS_FOR_TOKENIZER
    assert tk.tokenize_amharic_text("#አዲስ_እቃ @store") == ["#አዲስ_እቃ", "@store"]


def test_none_and_empty():
    assert tk.tokenize_amharic_text(None) == []
    assert tk.tokenize_amharic_text("") == []
    assert tk.tokenize_amharic_text("   ") == []


def test_labeling_tokenizer_goldens():
    for raw, expected in zip(TEMPLATES, goldens.M14_TOKENS):
        assert tk.tokenize_amharic_message(raw) == expected


def test_labeling_tokenizer_compound_splits():
    assert tk.tokenize_amharic_message("550ብር") == ["550", "ብር"]
    assert tk.tokenize_amharic_message("10x45") == ["10", "x", "45"]
