"""CLI stage runner — the engine's analog of the reference's
``scripts/run_pipeline.py --stage ...`` registry (run_pipeline.py:251-287).

Stages:
  make_corpus   — synthesize the input Parquet corpus (replaces ingest_data;
                  the Telegram scraper is an external source, out of engine
                  scope — SURVEY.md S1)
  build_kg      — flagship: triples + nodes + edges + scorecard (resumable)
  scorecard     — vendor scorecard only
  pseudo_label  — labeling loop → CoNLL
  evaluate      — NER eval harness over a CoNLL corpus
  curate        — quality filter → exact dedup → kept-docs manifest
  train_prep    — CoNLL → trainer-ready train/eval Parquet (A2 prep)
  incremental   — append a delta corpus to an existing build (tag delta only)
  all           — make_corpus → build_kg

Owns its Ray session (guarded init) — library code never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="amharic_ecommerce_data_extractor_ray")
    ap.add_argument("--stage", required=True,
                    choices=["make_corpus", "build_kg", "build_triples_sharded",
                             "scorecard", "pseudo_label", "evaluate", "curate",
                             "train_prep", "incremental", "all"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="input tables directory (documents.parquet seed)")
    ap.add_argument("--corpus-dir", default="/tmp/aede_corpus")
    ap.add_argument("--out-dir", default="/tmp/aede_out")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--conll", default=None, help="CoNLL path for evaluate")
    ap.add_argument("--shards", type=int, default=16,
                    help="partition count for build_triples_sharded")
    ap.add_argument("--delta-name", default=None,
                    help="unique name for this incremental delta (default: "
                         "the input dir's content fingerprint — ADVICE r2: "
                         "a fixed name would re-append into the same dirs "
                         "and double-count)")
    args = ap.parse_args(argv)

    _ensure_ray(args.num_cpus)
    import ray

    try:
        if args.stage in ("make_corpus", "all"):
            from .sources.corpus import make_corpus

            make_corpus(args.corpus_dir, args.rows)
            print(json.dumps({"stage": "make_corpus", "rows": args.rows,
                              "out": args.corpus_dir}))
        if args.stage in ("build_kg", "all"):
            from .pipelines.kg import build_kg

            manifest = build_kg(args.sf_dir, args.out_dir)
            print(json.dumps({"stage": "build_kg",
                              "datasets": manifest["datasets"]}))
        if args.stage == "build_triples_sharded":
            # per-partition resumable triples build over a multi-file corpus
            # (the 100 TB layout): crash anywhere → rerun redoes only the
            # in-flight shard
            import glob

            import ray.data as rd

            from .stages.enrich import fused_triples_batch
            from .state.checkpoint import sharded_checkpointed_write

            paths = sorted(glob.glob(f"{args.corpus_dir}/*.parquet"))

            def make_ds(shard_paths):
                return (rd.read_parquet(
                            shard_paths,
                            columns=["message_id", "repo", "content"])
                        .map_batches(fused_triples_batch,
                                     batch_format="pyarrow"))

            m = sharded_checkpointed_write(
                make_ds, paths, f"{args.out_dir}/triples_sharded",
                n_shards=args.shards)
            skipped = sum(1 for s in m["shards"].values() if s["skipped"])
            print(json.dumps({"stage": "build_triples_sharded",
                              "n_shards": m["n_shards"], "skipped": skipped,
                              "rows": sum(s["rows"] for s in m["shards"].values())}))
        if args.stage == "scorecard":
            from .pipelines.kg import vendor_scorecard

            sc = vendor_scorecard(args.sf_dir)
            print(sc.to_string(index=False))
        if args.stage == "pseudo_label":
            from .pipelines.kg import corpus_ds
            from .pipelines.labeling import pseudo_label_to_conll

            n = pseudo_label_to_conll(corpus_ds(args.sf_dir),
                                      f"{args.out_dir}/pseudo_labeled.conll")
            print(json.dumps({"stage": "pseudo_label", "sentences": n}))
        if args.stage == "incremental":
            # daily-delta KG maintenance: append a delta corpus (Parquet dir
            # of corpus-schema rows, --corpus-dir) to an existing build
            # (--out-dir); only the delta is tagged
            import ray.data as rd

            from .pipelines.incremental import incremental_update
            from .state.checkpoint import _input_fingerprint

            fp = _input_fingerprint(args.corpus_dir)
            delta = rd.read_parquet(args.corpus_dir)
            stats = incremental_update(args.out_dir, delta,
                                       delta_name=args.delta_name or fp,
                                       fingerprint=fp)
            print(json.dumps({"stage": "incremental", **stats}))
        if args.stage == "curate":
            # training-data curation: quality filter → exact dedup → manifest
            from .pipelines.curate import curate_documents
            from .state.checkpoint import checkpointed_write

            kept = curate_documents(args.sf_dir)
            res = checkpointed_write(kept, f"{args.out_dir}/curated")
            print(json.dumps({"stage": "curate", **res}))
        if args.stage == "train_prep":
            # NER fine-tuning data prep over a CoNLL corpus → train/eval
            # Parquet (input_ids + -100-masked labels, trainer-ready)
            from .pipelines.trainprep import prepare_training_data
            from .sources.conll import conll_to_dataset

            conll = args.conll or ("/root/reference/data/labeled/"
                                   "01_labeled_telegram_product_price_location.txt")
            train, test, vocab = prepare_training_data(conll_to_dataset(conll))
            train.write_parquet(f"{args.out_dir}/train_prep/train")
            test.write_parquet(f"{args.out_dir}/train_prep/eval")
            print(json.dumps({"stage": "train_prep", "labels": vocab,
                              "n_train": train.count(),
                              "n_eval": test.count()}))
        if args.stage == "evaluate":
            from .pipelines.evalharness import evaluate_file

            conll = args.conll or ("/root/reference/data/labeled/"
                                   "01_labeled_telegram_product_price_location.txt")
            m = evaluate_file(conll)
            print(json.dumps({k: v for k, v in m.items() if k != "per_label"}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
