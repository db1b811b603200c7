"""Heuristic tagger vs reference-captured goldens + BIO utilities."""

import math

from amharic_ecommerce_data_extractor_ray import goldens
from amharic_ecommerce_data_extractor_ray.functions.prices import extract_numerical_price
from amharic_ecommerce_data_extractor_ray.functions.tagger import (HeuristicTagger,
                                                 align_spans_to_tokens,
                                                 decode_entities)


def test_tagger_matches_reference_on_all_templates():
    tagger = HeuristicTagger()
    for tokens, expected in zip(goldens.TOKENS, goldens.TAGGED):
        assert tagger.tag(tokens) == expected


def test_fixtures_golden_sentence():
    # FIXTURES.md §4, tokens from the M14 tokenizer
    tokens = ["ዋጋ", ":", "550", "ብር", "መገናኛ", "ዛም", "ሞል",
              "portable", "blender", "electric"]
    expected = [("ዋጋ", "B-PRICE"), (":", "O"), ("550", "B-PRICE"),
                ("ብር", "I-PRICE"), ("መገናኛ", "B-LOC"), ("ዛም", "O"),
                ("ሞል", "B-LOC"), ("portable", "B-PRODUCT"),
                ("blender", "I-PRODUCT"), ("electric", "I-PRODUCT")]
    assert HeuristicTagger().tag(tokens) == expected


def test_embedded_price_b_i_chaining():
    # 1,200ብር style token: B-PRICE on the number only when previous label is O
    tagged = HeuristicTagger().tag(["1,200ብር"])
    assert tagged == [("1,200", "B-PRICE"), ("ብር", "I-PRICE")]


def test_decode_entities():
    tagged = [("a", "B-PRODUCT"), ("b", "I-PRODUCT"), ("c", "O"),
              ("d", "B-LOC"), ("e", "B-LOC"), ("f", "I-PRICE")]
    assert decode_entities(tagged) == [
        ("PRODUCT", "a b"), ("LOC", "d"), ("LOC", "e"), ("PRICE", "f")]


def test_price_parse_nb_semantics():
    assert extract_numerical_price(["550", "ብር"]) == 550.0
    assert extract_numerical_price(["1,200 ብር"]) == 1200.0
    assert math.isnan(extract_numerical_price(["ዋጋ 3500 ብር"]))
    # character-class strip: 'etb' loses b → 'et' → NaN (nb quirk preserved)
    assert math.isnan(extract_numerical_price(["25000 etb"]))
    assert math.isnan(extract_numerical_price([]))


def test_align_spans_to_tokens():
    text = "ዋጋ 550 ብር መገናኛ"
    tokens = ["ዋጋ", "550", "ብር", "መገናኛ"]
    spans = [{"start": 3, "end": 9, "entity_group": "PRICE"},
             {"start": 10, "end": 14, "entity_group": "LOC"}]
    assert align_spans_to_tokens(text, tokens, spans) == [
        ("ዋጋ", "O"), ("550", "B-PRICE"), ("ብር", "I-PRICE"), ("መገናኛ", "B-LOC")]


def test_model_tagger_unavailable_raises_cleanly():
    import pytest

    from amharic_ecommerce_data_extractor_ray.functions.tagger import ModelTagger

    with pytest.raises(NotImplementedError, match="HeuristicTagger"):
        ModelTagger("/nonexistent/model")


def test_stateful_tag_stage_actor_pool(ray_session):
    """Actor-pool plumbing of the model-tagger stage shape: a stateful
    callable CLASS via map_batches(Cls, concurrency=2) — init once per actor
    (counted), batched __call__, same output schema as tag_batch."""
    import pyarrow as pa
    import ray.data as rd

    class FakeModelTagStage:
        def __init__(self):
            from amharic_ecommerce_data_extractor_ray.functions.tagger import HeuristicTagger

            self.tagger = HeuristicTagger()  # stands in for weight loading
            self.n_batches = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            self.n_batches += 1
            toks = batch["tokens"].to_pylist()
            pairs = [self.tagger.tag(t or []) for t in toks]
            return batch.append_column(
                "tag_labels",
                pa.array([[p[1] for p in pr] for pr in pairs],
                         pa.list_(pa.string())))

    rows = [{"message_id": i, "tokens": ["ዋጋ", "550", "ብር"]} for i in range(64)]
    out = (rd.from_items(rows)
           .map_batches(FakeModelTagStage, batch_size=8, concurrency=2,
                        batch_format="pyarrow")
           .to_pandas())
    assert len(out) == 64
    assert all(list(l) == ["B-PRICE", "I-PRICE", "I-PRICE"]
               for l in out["tag_labels"])
