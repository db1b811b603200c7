"""Wiring test for the HF-model actor-pool tagger (A1 HF variant).

Runs only when torch + transformers exist (importorskip — absent in this
sandbox): builds a TINY random token-classification checkpoint locally (no
download), then drives ``ModelTagStage`` through a real
``map_batches(..., concurrency=1)`` actor pool so the init-once / tag-batch
contract is exercised end to end the day the libraries appear
(VERDICT r3 #7).
"""

import pytest

LABELS = ["O", "B-PRODUCT", "I-PRODUCT", "B-PRICE", "I-PRICE",
          "B-LOC", "I-LOC", "B-CONTACT_INFO", "I-CONTACT_INFO"]

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "hello", "world", "price", "500", "birr", "addis", "phone"]


def _write_tiny_checkpoint(out_dir: str) -> str:
    """2-layer random BertForTokenClassification + word-piece tokenizer,
    written entirely from local config — no network, no pretrained pull."""
    import transformers

    vocab_file = f"{out_dir}/vocab.txt"
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB))
    tok = transformers.BertTokenizerFast(vocab_file=vocab_file,
                                         do_lower_case=True)
    config = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=64,
        num_labels=len(LABELS),
        id2label=dict(enumerate(LABELS)),
        label2id={l: i for i, l in enumerate(LABELS)},
    )
    import torch

    torch.manual_seed(0)
    model = transformers.BertForTokenClassification(config)
    model.save_pretrained(out_dir)
    tok.save_pretrained(out_dir)
    return out_dir


def test_model_tag_stage_actor_pool_wiring(ray_session, tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.enrich import (
        ModelTagStage)

    model_dir = _write_tiny_checkpoint(str(tmp_path))
    rows = [{"message_id": 1, "tokens": ["hello", "world"]},
            {"message_id": 2, "tokens": ["price", "500", "birr"]},
            {"message_id": 3, "tokens": []}]
    out = (rd.from_items(rows)
           .map_batches(ModelTagStage,
                        fn_constructor_kwargs={"model_dir": model_dir},
                        concurrency=1, batch_size=2,
                        batch_format="pyarrow")
           .to_pandas().sort_values("message_id").reset_index(drop=True))
    assert list(out.columns) == ["message_id", "tokens", "tag_tokens",
                                 "tag_labels"]
    # per-row alignment contract: one label per pipeline token, labels from
    # the model's BIO label space
    for _, r in out.iterrows():
        assert list(r["tag_tokens"]) == list(r["tokens"])
        assert len(r["tag_labels"]) == len(r["tokens"])
        assert all(lab in LABELS for lab in r["tag_labels"])


def test_model_tagger_init_raises_cleanly_without_torch():
    """Without torch/transformers the tagger must fail with the documented
    NotImplementedError (not an opaque ImportError mid-batch)."""
    try:
        import transformers  # noqa: F401
        import torch  # noqa: F401
        pytest.skip("torch/transformers present — covered by the wiring test")
    except ImportError:
        pass
    from amharic_ecommerce_data_extractor_ray.functions.tagger import (
        ModelTagger)

    with pytest.raises(NotImplementedError, match="HeuristicTagger"):
        ModelTagger("/nonexistent/model/dir")
