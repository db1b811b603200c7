"""HF fine-tune + inference smoke (VERDICT r4 next-step #4): the A2/A1 HF
paths exercised end to end the day torch/transformers exist — 1 epoch over
32 pseudo-labeled corpus sentences, then ``ModelTagStage`` (the HF
actor-pool tagger) over the sf0.001 corpus head, reporting token-level
P/R/F1 of the fine-tuned model against the rule tagger's labels.

Skips cleanly (exit 0, "SKIP" line) where torch/transformers are absent —
the case in this sandbox.

Model source:
- default: a TINY random BERT checkpoint built locally from the smoke
  sentences' own wordpiece vocabulary (no network, no pretrained pull —
  same recipe as tests/test_model_tag_stage.py).  Random 16-dim weights
  fine-tuned 1 epoch on 32 sentences exercise the WIRING, not quality, so
  no P/R threshold is asserted.
- ``HF_SMOKE_MODEL=/path/to/pretrained``: fine-tunes that checkpoint and
  asserts F1 >= HF_SMOKE_MIN_F1 (default 0.95 — the reference's
  docs/source/ner_model.rst:40-56 bar) against the rule labels.

Usage: ``make hf-smoke`` or ``python scripts/hf_smoke.py [sf_dir]``.
"""

import json
import os
import sys
import tempfile

SF_DEFAULT = "/root/testdata/sf0.001"
LABELS = ["O", "B-PRODUCT", "I-PRODUCT", "B-PRICE", "I-PRICE",
          "B-LOC", "I-LOC", "B-CONTACT_INFO", "I-CONTACT_INFO"]


def _write_tiny_checkpoint(out_dir: str, word_vocab: list[str]) -> str:
    """2-layer random BertForTokenClassification + wordpiece tokenizer over
    the smoke sentences' own tokens — built entirely from local config."""
    import torch
    import transformers

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + word_vocab
    vocab_file = f"{out_dir}/vocab.txt"
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=vocab_file,
                                         do_lower_case=False)
    config = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=128, num_labels=len(LABELS),
        id2label=dict(enumerate(LABELS)),
        label2id={l: i for i, l in enumerate(LABELS)})
    torch.manual_seed(0)
    model = transformers.BertForTokenClassification(config)
    model.save_pretrained(out_dir)
    tok.save_pretrained(out_dir)
    return out_dir


def main() -> None:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        print("SKIP hf-smoke: torch/transformers not available "
              "in this environment")
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DEFAULT

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.pipelines.trainprep import (
        hf_finetune_token_classifier)
    from amharic_ecommerce_data_extractor_ray.stages.enrich import (
        ModelTagStage)

    # 32 pseudo-labeled sentences (rule tagger = label source, A4)
    def sentences(b: pa.Table) -> pa.Table:
        return pa.table({"message_id": b["message_id"],
                         "tokens": b["tag_tokens"],
                         "labels": b["tag_labels"]})

    sent_ds = (kg.tagged_messages(sf_dir).limit(32)
               .map_batches(sentences, batch_format="pyarrow")
               .materialize())

    model_src = os.environ.get("HF_SMOKE_MODEL", "")
    out_dir = tempfile.mkdtemp(prefix="hf_smoke_model_")
    if not model_src:
        words = sorted({t for r in sent_ds.take_all()
                        for t in r["tokens"]})
        model_src = _write_tiny_checkpoint(
            tempfile.mkdtemp(prefix="hf_smoke_ckpt_"), words)

    metrics = hf_finetune_token_classifier(
        sent_ds, LABELS, model_dir=model_src, out_dir=out_dir, epochs=1)

    # HF actor-pool inference over the corpus head; compare to rule labels
    scored = (kg.tagged_messages(sf_dir).limit(64)
              .map_batches(lambda b: pa.table({
                  "message_id": b["message_id"],
                  "tokens": b["tag_tokens"],
                  "rule_labels": b["tag_labels"]}),
                  batch_format="pyarrow")
              .map_batches(ModelTagStage,
                           fn_constructor_kwargs={"model_dir": out_dir},
                           concurrency=1, batch_size=16,
                           batch_format="pyarrow")
              .to_pandas())

    tp = fp = fn = 0
    for _, r in scored.iterrows():
        for rule, pred in zip(r["rule_labels"], r["tag_labels"]):
            if pred != "O" and rule == pred:
                tp += 1
            else:
                # a cross-label confusion (pred B-PRICE, rule B-PRODUCT)
                # is BOTH a false positive and a missed rule token
                if pred != "O":
                    fp += 1
                if rule != "O":
                    fn += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    report = {"status": "ok", **metrics,
              "precision": round(prec, 4), "recall": round(rec, 4),
              "f1": round(f1, 4), "n_eval_messages": int(len(scored))}
    print(json.dumps(report))

    min_f1 = os.environ.get(
        "HF_SMOKE_MIN_F1",
        "0.95" if os.environ.get("HF_SMOKE_MODEL") else "")
    if min_f1:
        assert f1 >= float(min_f1), \
            f"hf-smoke F1 {f1:.4f} below threshold {min_f1}"
    ray.shutdown()


if __name__ == "__main__":
    main()
