"""Driver contract implementation: entry(), queries(), oracle_sql().

Every implemented operator/pipeline from SURVEY.md §2 (plus the large-scale
extensions: dedup, similarity search, text analysis, multimodal plumbing) has
a ``queries()`` entry; SQL-expressible ones have a DuckDB oracle in
``oracle_sql()`` — the KG oracles encode behavior captured from EXECUTING the
reference implementation (see oracles.py / scripts/capture_goldens.py).

No ray.init()/shutdown() here — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from . import oracles
from .pipelines import entity_res, kg, rag, relational, tpch_ext
from .stages import dedup, multimodal, similarity, textstats
from .stages.enrich import enrich_batch

SIM_QUERY_IDS = list(range(10))
SIM_K = 10
# multi-table LSH (round 3): 8 independent 4-plane tables, union of
# candidates — measured mean recall 0.71 vs 0.24 single-table at sf0.001
SIM_LSH_TABLES = 8
SIM_LSH_PLANES = 4
EMB_DEDUP_THRESHOLD = 0.4
# exact substring-window dedup: run length in tokens (Lee et al. use 50
# BPE tokens; the synthetic docs are ~55 tokens, so 8 keeps the pair set
# non-empty at every sf)
SUBSTR_WINDOW = 8


# --------------------------------------------------------------- KG pipeline

def q_corpus(sf_dir: str):
    ds = kg.corpus_ds(sf_dir)

    def date_to_str(b: pa.Table) -> pa.Table:
        idx = b.schema.get_field_index("message_date")
        return b.set_column(idx, "message_date",
                            pc.strftime(b["message_date"], format="%Y-%m-%d"))

    return ds.map_batches(date_to_str, batch_format="pyarrow")


def q_normalize(sf_dir: str):
    ds = kg.corpus_ds(sf_dir).map_batches(enrich_batch, batch_format="pyarrow")

    def project(b: pa.Table) -> pa.Table:
        toks = b["tokens"].to_pylist()
        return pa.table({
            "message_id": b["message_id"],
            "repo": b["repo"],
            "content_sha256": b["content_sha256"],
            "preprocessed_text": b["preprocessed_text"],
            "token_str": pa.array([oracles.TOKEN_SEP.join(t) for t in toks],
                                  pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def q_normalize_stopwords(sf_dir: str):
    """M8: the stopword-removal normalize variant (off by default in the
    pipeline; exposed as its own operator)."""
    ds = kg.corpus_ds(sf_dir).map_batches(
        lambda b: enrich_batch(b, remove_stopwords=True),
        batch_format="pyarrow")
    return ds.select_columns(["message_id", "content_sha256",
                              "preprocessed_text"])


def q_triples(sf_dir: str):
    # shared session-memoized tag pass (VERDICT r3 #1) — nodes/edges/graph
    # queries in the same gate run reuse this boundary instead of re-tagging
    ds = kg.triples_materialized(sf_dir)
    return ds.select_columns(["message_id", "subj", "pred", "obj", "obj_norm",
                              "price_value", "content_sha256"])


def q_kg_nodes(sf_dir: str):
    return kg.kg_nodes(sf_dir)


def q_kg_edges(sf_dir: str):
    return kg.kg_edges(sf_dir)


def q_scorecard(sf_dir: str):
    pdf = kg.vendor_scorecard(sf_dir)
    for col in ("avg_views_per_post", "posts_per_week", "avg_price_etb",
                "top_product_price", "lending_score"):
        pdf[col] = pdf[col].round(6)
    return pdf[["vendor", "total_posts", "avg_views_per_post", "posts_per_week",
                "avg_price_etb", "top_product", "top_product_price",
                "date_range_days", "lending_score"]]


# ------------------------------------------------------- labeling / eval ops

def q_bio_tags(sf_dir: str):
    """Token-level BIO prediction table (reference model_evaluator.py:199-215
    minus the blank-separator presentation rows)."""
    from .pipelines.labeling import bio_tags_batch

    return kg.corpus_ds(sf_dir).map_batches(bio_tags_batch,
                                            batch_format="pyarrow")


def q_bio_tags_model(sf_dir: str):
    """A1/S11: token-level BIO predictions from the REAL batched model
    forward pass (actor pool, weights built once per actor) through the M18
    span→token alignment.  Deterministic seeded weights → oracle-checked."""
    from .stages.enrich import NumpyModelTagStage, enrich_batch

    ds = (kg.corpus_ds(sf_dir)
          .map_batches(enrich_batch, batch_format="pyarrow")
          .map_batches(NumpyModelTagStage, batch_format="pyarrow",
                       batch_size=256, concurrency=2))

    def explode(b: pa.Table) -> pa.Table:
        # vectorized list explode (offsets arithmetic — no Python loop over
        # tokens; the model stage upstream is batched numpy already)
        import numpy as np

        empty = pa.scalar([], pa.list_(pa.string()))

        def arr(col):
            a = pc.fill_null(col, empty)
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) \
                else a

        toks = arr(b["tag_tokens"])
        labs = arr(b["tag_labels"])
        n = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        mids = np.repeat(
            b["message_id"].to_numpy(zero_copy_only=False), n)
        offs = np.concatenate([[0], np.cumsum(n)])
        idx = np.arange(int(offs[-1]), dtype=np.int64) \
            - np.repeat(offs[:-1], n)
        return pa.table({
            "message_id": pa.array(mids.astype(np.int64), pa.int64()),
            "tok_idx": pa.array(idx, pa.int64()),
            "token": toks.flatten(),
            "label": labs.flatten(),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def q_train_prep(sf_dir: str):
    """A2 prep over the pseudo-labeled corpus: corpus → tag → (tokens,
    labels) sentences → label-id conversion → subword tokenize + -100-masked
    alignment, exploded to one row per subword piece."""
    from .pipelines.trainprep import (label_vocab_distributed,
                                      to_hf_format_batch,
                                      tokenize_and_align_batch)
    from .stages.enrich import enrich_batch, tag_batch

    def sentences(b: pa.Table) -> pa.Table:
        b = tag_batch(enrich_batch(b))
        return pa.table({
            "message_id": b["message_id"],
            "tokens": b["tag_tokens"],
            "labels": b["tag_labels"],
        })

    sent_ds = kg.corpus_ds(sf_dir).map_batches(sentences,
                                               batch_format="pyarrow")
    vocab = label_vocab_distributed(sent_ds)
    label_to_id = {l: i for i, l in enumerate(vocab)}
    aligned = (sent_ds
               .map_batches(lambda b: to_hf_format_batch(
                   b, label_to_id=label_to_id, id_col="message_id"),
                   batch_format="pyarrow")
               .map_batches(tokenize_and_align_batch, batch_format="pyarrow"))

    def explode(b: pa.Table) -> pa.Table:
        # vectorized multi-list explode (offsets arithmetic; the three list
        # columns are aligned piece-for-piece by construction)
        import numpy as np

        def arr(col):
            a = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            return a

        pieces = arr(b["pieces"])
        iids = arr(b["input_ids"])
        labs = arr(b["labels_aligned"])
        n = np.diff(np.asarray(pieces.offsets, dtype=np.int64))
        mids = np.repeat(
            b["message_id"].to_numpy(zero_copy_only=False), n)
        offs = np.concatenate([[0], np.cumsum(n)])
        idx = np.arange(int(offs[-1]), dtype=np.int64) \
            - np.repeat(offs[:-1], n)
        return pa.table({
            "message_id": pa.array(mids.astype(np.int64), pa.int64()),
            "piece_idx": pa.array(idx, pa.int64()),
            "piece": pieces.flatten(),
            "input_id": pc.cast(iids.flatten(), pa.int64()),
            "label_id": pc.cast(labs.flatten(), pa.int64()),
        })

    return aligned.map_batches(explode, batch_format="pyarrow")


def q_labeling_sheet(sf_dir: str):
    """S10/O2: first 50 messages → normalized tokens with all-O skeleton."""
    from .pipelines.labeling import labeling_sheet_batch

    return kg.corpus_ds(sf_dir).limit(50).map_batches(
        labeling_sheet_batch, batch_format="pyarrow")


def q_conll_csv(sf_dir: str):
    """S9: labeling loop → (message_id, message_text, labels_sequence)."""
    from .pipelines.labeling import conll_csv_batch

    return kg.corpus_ds(sf_dir).map_batches(conll_csv_batch,
                                            batch_format="pyarrow")


def q_corpus_summary(sf_dir: str):
    """G5 summary statistics per channel: post counts, views, empty-text and
    non-Amharic counts (native algebraic aggregates — combiner merge is
    built in, shuffle moves one partial row per vendor per block)."""
    from ray.data.aggregate import Count, Mean, Sum

    from .functions.normalize_vec import normalize_array_post_nfc
    from .stages.enrich import _nfc

    def flags(b: pa.Table) -> pa.Table:
        # empty-after-normalize via the Arrow re2 kernel chain (bit-identical
        # to the scalar normalize, pinned by the differential fuzz) — no
        # per-row Python normalize
        norm = normalize_array_post_nfc(
            pa.array(_nfc(b["content"].to_pylist()), pa.string()))
        empty = pc.cast(pc.equal(norm, ""), pa.int64())
        is_en = pc.cast(pc.equal(b["lang"], "en"), pa.int64())
        return pa.table({
            "repo": b["repo"],
            "views": b["views"],
            "is_empty": empty,
            "is_en": is_en,
        })

    ds = kg.corpus_ds(sf_dir).map_batches(flags, batch_format="pyarrow")
    agg = ds.groupby("repo").aggregate(
        Count(alias_name="n_posts"),
        Sum("views", alias_name="sum_views"),
        Mean("views", alias_name="avg_views"),
        Sum("is_empty", alias_name="n_empty_text"),
        Sum("is_en", alias_name="n_en"),
    )

    def round_avg(b: pa.Table) -> pa.Table:
        idx = b.schema.get_field_index("avg_views")
        return b.set_column(idx, "avg_views", pc.round(b["avg_views"], 6))

    return agg.map_batches(round_avg, batch_format="pyarrow")


# ------------------------------------------------------------- text analysis

def q_langid(sf_dir: str):
    ds = kg.corpus_ds(sf_dir).map_batches(textstats.langid_batch,
                                          batch_format="pyarrow")
    return ds.select_columns(["message_id", "lang", "pred_lang"])


def q_token_counts(sf_dir: str):
    ds = kg.corpus_ds(sf_dir).map_batches(textstats.token_count_batch,
                                          batch_format="pyarrow")
    return ds.select_columns(["message_id", "n_ws_tokens", "n_bpe_tokens"])


def q_langid_confusion(sf_dir: str):
    """Declared-vs-predicted language confusion matrix: langid kernel +
    per-batch (lang, pred_lang) count partials, label-vocab² shuffle."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        t = textstats.langid_batch(b, text_col="content")
        return (pa.table({"lang": t["lang"], "pred_lang": t["pred_lang"]})
                .group_by(["lang", "pred_lang"])
                .aggregate([([], "count_all")])
                .rename_columns(["lang", "pred_lang", "n"]))

    return (kg.corpus_ds(sf_dir)
            .map_batches(partials, batch_format="pyarrow")
            .groupby(["lang", "pred_lang"])
            .aggregate(Sum("n", alias_name="n")))


def q_expectations(sf_dir: str):
    """Deequ-style constraint suite: row checks fused into one streaming
    scan, uniqueness via key-only groupby, referential via anti join."""
    from .stages.expectations import expectations_report

    return expectations_report(sf_dir)


def q_dedup_histogram(sf_dir: str):
    """Duplicate-cluster size histogram: how much of the corpus is
    singletons vs heavy clusters — the dedup diagnostic read before
    choosing thresholds.  exact_dedup_groups (hash-keyed combiner) → one
    tiny (n_dups)-keyed groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .stages.dedup import exact_dedup_groups

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return (exact_dedup_groups(docs)
            .groupby("n_dups")
            .aggregate(Count(alias_name="n_clusters"),
                       Sum("n_dups", alias_name="n_docs")))


def q_gopher_rules(sf_dir: str):
    """Gopher-style quality rule suite (Rae et al. 2021) with per-rule
    audit flags; stateless streaming kernel."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(textstats.gopher_rules_batch,
                          batch_format="pyarrow")


def q_doc_quality(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(lambda b: textstats.quality_batch(b, text_col="text"),
                        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "q_chars", "q_tokens", "q_punct",
                              "q_stopwords"])


def q_fingerprint(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(lambda b: textstats.fingerprint_batch(b, text_col="text"),
                        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


class _EmbedStage:
    """Actor-pool embedding generation: embedder state (feature cache)
    builds once per actor; per-batch mean-pooled doc vectors, exploded to
    (doc_id, dim_idx, value) rows for exact oracle comparison."""

    def __init__(self):
        from .functions.np_model import HashEmbedder

        self.embedder = HashEmbedder()

    def __call__(self, b: pa.Table) -> pa.Table:
        out_id, out_dim, out_val = [], [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            v = self.embedder.embed(t or "")
            if v is None:
                continue
            for j, x in enumerate(v):
                out_id.append(did)
                out_dim.append(j)
                out_val.append(round(float(x), 6))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "dim_idx": pa.array(out_dim, pa.int64()),
            "value": pa.array(out_val, pa.float64()),
        })


def q_embed_documents(sf_dir: str):
    """Embedding-generation stage (actor pool) over documents."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs.map_batches(_EmbedStage, batch_format="pyarrow",
                            batch_size=512, concurrency=2)


def q_salted_topk(sf_dir: str):
    """Salted two-phase top-k (explicit skew handling, north rule): top-3
    orders by totalprice per o_orderpriority — the priority key has only 5
    values over 15K+ orders, exactly the hot-key shape salting spreads.
    Phase 1 runs per (key, salt) shard, phase 2 merges the tiny partials."""
    import ray.data as rd

    from .stages.skew import salted_groupby, topk_phase1, topk_phase2

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority", "o_orderkey",
                                      "o_totalprice"])

    def phase1(g):
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(3)
        return g.drop(columns=["_salt"])

    def phase2(g):
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(3)

    out = salted_groupby(orders, "o_orderpriority", phase1, phase2,
                         n_salts=8)

    def round_price(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("o_totalprice"),
                            "o_totalprice", pc.round(b["o_totalprice"], 2))

    return out.map_batches(round_price, batch_format="pyarrow")


def q_compact(sf_dir: str):
    """Parquet compaction round-trip: documents → re-layout under /tmp →
    re-read; the oracle checks byte-preservation of every row."""
    import tempfile

    from .sources.readers import compact_parquet

    out = tempfile.mkdtemp(prefix="compact_docs_")
    ds = compact_parquet(f"{sf_dir}/documents.parquet", out,
                         target_rows_per_file=2000)
    return ds.select_columns(["doc_id", "text", "lang", "source"])


def q_zipf_fit(sf_dir: str):
    """Zipf-law fit over the top-1000 token frequencies (corpus health)."""
    import ray.data as rd

    from .stages.corpus_stats import zipf_fit

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return zipf_fit(docs, k=1000)


def q_token_topk(sf_dir: str):
    """Heavy-hitter vocabulary: global top-100 tokens by frequency."""
    import ray.data as rd

    from .stages.corpus_stats import token_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return token_topk(docs, k=100)


def q_hash_sample(sf_dir: str):
    """Deterministic shard-stable 10% sample (hash threshold, no shuffle)."""
    import ray.data as rd

    from .stages.corpus_stats import hash_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    return hash_sample(docs, key_col="doc_id", rate_pct=10)


STRATA_RATES = {"en": 10, "fr": 100, "es": 50}


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sample: 10% of en, all of fr, half of es,
    none of the unlisted strata — corpus rebalancing as a pure filter."""
    import ray.data as rd

    from .stages.corpus_stats import stratified_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    return stratified_sample(docs, stratum_col="lang", key_col="doc_id",
                             rates_pct=STRATA_RATES, default_pct=0)


HISTQ_QUANTILES = (0.25, 0.5, 0.75, 0.95)
HISTQ_LO, HISTQ_HI, HISTQ_BINS = 0.0, 120_000.0, 1024


def q_histogram_quantile(sf_dir: str):
    """Mergeable fixed-bin histogram quantiles of l_extendedprice (driver
    receives ONE bins-sized vector; estimate deterministic → SQL oracle)."""
    import ray.data as rd

    from .stages.sketch import histogram_quantile

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    return histogram_quantile(li, col="l_extendedprice",
                              quantiles=HISTQ_QUANTILES,
                              lo=HISTQ_LO, hi=HISTQ_HI, bins=HISTQ_BINS)


GHISTQ_QUANTILES = (0.25, 0.5, 0.9)
GHISTQ_LO, GHISTQ_HI, GHISTQ_BINS = 0.0, 500.0, 256


def q_grouped_quantiles(sf_dir: str):
    """Per-event-type approximate quantiles of value via the grouped
    mergeable histogram (GROUP BY + PERCENTILE in one bounded shuffle)."""
    import ray.data as rd

    from .stages.sketch import grouped_histogram_quantile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_histogram_quantile(ev, group_col="event_type",
                                      col="value",
                                      quantiles=GHISTQ_QUANTILES,
                                      lo=GHISTQ_LO, hi=GHISTQ_HI,
                                      bins=GHISTQ_BINS)


CONTAM_N, CONTAM_MOD, CONTAM_FLAG = 3, 11, 5


def q_contamination(sf_dir: str):
    """Benchmark decontamination scan: per-doc distinct 3-gram overlap with
    the benchmark subset (doc_id % 11 == 0), broadcast hash-set probe."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .stages.contamination import ngram_contamination

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    def is_bench(b):
        import numpy as np
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.asarray(ids) % CONTAM_MOD == 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    return ngram_contamination(docs, bench, n=CONTAM_N,
                               flag_threshold=CONTAM_FLAG)


def q_decontaminate(sf_dir: str):
    """Decontamination APPLY: drop benchmark-quarantined docs (the
    contamination scan's flagged set) from the corpus via the distributed
    ANTI join — the curation step the scan exists to feed.  Output: the
    surviving corpus keyed + summarized (id, lang, source)."""
    import ray.data as rd

    from .stages.joins import hash_anti_join

    scan = q_contamination(sf_dir)

    def flagged(b: pa.Table) -> pa.Table:
        b = b.filter(b["contaminated"])
        return b.select(["doc_id"])

    bad = scan.map_batches(flagged, batch_format="pyarrow")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    out = hash_anti_join(docs, bad, on="doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


CAPPED_SAMPLE_K = 7


def q_capped_sample(sf_dir: str):
    """Fixed-size per-language sample: K docs per lang by stable hash rank
    (block-local prune -> one bounded groupby re-prune)."""
    import ray.data as rd

    from .stages.corpus_stats import per_group_capped_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return per_group_capped_sample(docs, group_col="lang", key_col="doc_id",
                                   k=CAPPED_SAMPLE_K)


def q_trending_tokens(sf_dir: str):
    """Top-3 tokens per calendar day over the message stream (windowed
    heavy hitters, one bounded shuffle)."""
    from .stages.corpus_stats import trending_tokens

    return trending_tokens(kg.corpus_ds(sf_dir), k=3)


def q_tfidf(sf_dir: str):
    """Per-document top-3 TF-IDF terms (df pass + broadcast idf)."""
    import ray.data as rd

    from .stages.corpus_stats import tfidf_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return tfidf_topk(docs, k=3)


BM25_QUERY = ["spark", "join", "window", "filter", "stream"]


def q_bm25(sf_dir: str):
    """BM25 top-20 documents for a fixed bag-of-terms query (query-term df
    pass + broadcast idf, vectorized tf scoring, partial top-k)."""
    import ray.data as rd

    from .stages.corpus_stats import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bm25_topk(docs, BM25_QUERY, k=20)


def q_pii_scrub(sf_dir: str):
    """Training-data hygiene: email/phone redaction over the corpus."""
    ds = kg.corpus_ds(sf_dir).map_batches(textstats.pii_scrub_batch,
                                          batch_format="pyarrow")
    return ds.select_columns(["message_id", "scrubbed"])


def q_asof_clicks(sf_dir: str):
    """As-of join (custom operator — Ray Data has no native as-of): each
    purchase event gets the user's latest click at or before it.  Oracle is
    DuckDB's native ASOF LEFT JOIN — a fully independent implementation."""
    import ray.data as rd

    from .stages.joins import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def only(kind):
        def fn(b: pa.Table) -> pa.Table:
            return (b.filter(pc.equal(b["event_type"], kind))
                    .drop_columns(["event_type"]))
        return fn

    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow")
    clicks = ev.map_batches(only("click"), batch_format="pyarrow")
    joined = asof_join(purchases, clicks, by="user_id", on="ts",
                       right_cols=["ts", "event_id"])

    def fmt(df):
        import pandas as pd

        click_ts = pd.to_datetime(df["ts_r"]).dt.strftime(
            "%Y-%m-%d %H:%M:%S.%f")
        out = pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": pd.to_datetime(df["ts"]).dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "click_ts": click_ts.where(click_ts.notna(), None),
            "click_id": pd.to_numeric(df["event_id_r"]),
        })
        return out

    return joined.map_batches(fmt, batch_format="pandas")


def q_token_topk_sketch(sf_dir: str):
    """Bounded-memory heavy-hitter sketch; exact (== the SQL oracle) while
    per-batch vocabulary stays under the capacity, approximate beyond."""
    import ray.data as rd

    from .stages.corpus_stats import space_saving_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return space_saving_topk(docs, k=100, capacity=4096)


def q_inverted_index(sf_dir: str):
    """Inverted index: token → df + capped ascending posting list."""
    import ray.data as rd

    from .stages.corpus_stats import inverted_index

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return inverted_index(docs, max_postings=20)


def q_token_pmi(sf_dir: str):
    """Collocation mining: top-50 token pairs by document-level PMI."""
    import ray.data as rd

    from .stages.corpus_stats import token_pmi

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return token_pmi(docs, min_support=5, k=50)


def q_sessionize(sf_dir: str):
    """Behavioral-log sessionization: 30-min-gap sessions per user."""
    import ray.data as rd

    from .stages.corpus_stats import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    return sessionize(ev)


# --------------------------------------------------------------------- dedup

def q_curate(sf_dir: str):
    """Composed curation pipeline: quality filter → exact dedup → kept-docs
    manifest (pipelines/curate.py)."""
    from .pipelines.curate import curate_documents

    return curate_documents(sf_dir)


def q_approx_ndistinct(sf_dir: str):
    """KMV sketch COUNT(DISTINCT text) over documents (rows-only check:
    the estimate is probabilistic; error bound pinned by tests)."""
    import ray.data as rd

    from .stages.sketch import approx_ndistinct

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return approx_ndistinct(docs, "text")


def q_approx_ndistinct_hll(sf_dir: str):
    """HyperLogLog COUNT(DISTINCT text) over documents — the constant-
    memory mergeable companion to the KMV sketch; the oracle recomputes
    every register and the corrected estimate in pure SQL."""
    import ray.data as rd

    from .stages.sketch import approx_ndistinct_hll

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return approx_ndistinct_hll(docs, "text")


def q_countmin_topk(sf_dir: str):
    """Count-min-sketch token frequency estimates (top-100 by estimate):
    distributed matrix fold → broadcast once → vectorized vocab scoring."""
    import ray.data as rd

    from .stages.sketch import countmin_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return countmin_topk(docs, text_col="text", k=100)


def q_token_chunks(sf_dir: str):
    """Fixed-window token chunking (window 32, stride 24) — the training
    sequence-prep explode; fully vectorized Arrow gather."""
    import ray.data as rd

    from .stages.seqprep import token_chunks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return token_chunks(docs, window=32, stride=24)


def q_dsir_weights(sf_dir: str):
    import ray.data as rd

    from .stages.seqprep import dsir_weights

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return dsir_weights(docs, target_value="en")


def q_bpe_pairs(sf_dir: str):
    import ray.data as rd

    from .stages.seqprep import bpe_pair_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return bpe_pair_stats(docs, top_n=50)


def q_doc_perplexity(sf_dir: str):
    """Per-document perplexity under the corpus's own add-1 unigram LM —
    the CCNet-style LM quality filter; vocab meets docs in a distributed
    hash join, never a driver collect."""
    import ray.data as rd

    from .stages.seqprep import doc_perplexity

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return doc_perplexity(docs, k_smooth=1.0)


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL interchange round-trip (S3/S4 format-coverage analog):
    documents → ds.write_json under /tmp → ds.read_json; the oracle checks
    byte-preservation of every row, unicode text included."""
    import tempfile

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="jsonl_docs_")
    (rd.read_parquet(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text", "lang", "source"])
     .write_json(out))
    return rd.read_json(out).select_columns(["doc_id", "text", "lang",
                                             "source"])


def q_orc_roundtrip(sf_dir: str):
    """ORC interchange round-trip over the custom stripe-streaming
    datasource/datasink (sources/columnar.py) — Ray Data has no native ORC
    reader, so this exercises the FileBasedDatasource extension point the
    way a 100 TB ORC lake would hit it (per-file parallel, per-stripe
    blocks, distributed per-block writes)."""
    import tempfile

    import ray.data as rd

    from .sources.columnar import read_orc, write_orc

    out = tempfile.mkdtemp(prefix="orc_docs_")
    write_orc(rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang", "source"]),
              out)
    return read_orc(out, columns=["doc_id", "text", "lang", "source"])


def q_feather_roundtrip(sf_dir: str):
    """Feather-v2/Arrow-IPC round-trip via the record-batch-streaming
    datasource (sources/columnar.py) with column pruning on the read."""
    import tempfile

    import ray.data as rd

    from .sources.columnar import read_feather, write_feather

    out = tempfile.mkdtemp(prefix="feather_docs_")
    write_feather(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text", "lang",
                                           "source"]),
                  out)
    return read_feather(out, columns=["doc_id", "text", "lang", "source"])


def q_pq_codes(sf_dir: str):
    """Product-quantization codebooks + codes over the embeddings table
    (2 subspaces × 16 centroids, 2 Lloyd's iterations, deterministic)."""
    import ray.data as rd

    from .stages.similarity import pq_codes

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pq_codes(emb, m_subspaces=2, k_codes=16, n_iter=2)


def q_similarity_pq_adc(sf_dir: str):
    """PQ asymmetric-distance top-k (the search path over the compressed
    codes corpus — completes the IVF-PQ story with the ADC scan)."""
    import ray.data as rd

    from .stages.similarity import pq_adc_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pq_adc_topk(emb, SIM_QUERY_IDS, k=SIM_K, m_subspaces=2,
                       k_codes=16, n_iter=2)


def q_similarity_pq_rerank(sf_dir: str):
    """ADC shortlist → exact cosine re-rank (Jégou et al. §V): the
    production IVF-PQ pattern — compressed scan proposes, exact distances
    on the |q|×shortlist gather decide."""
    import ray.data as rd

    from .stages.similarity import pq_adc_rerank_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pq_adc_rerank_topk(emb, SIM_QUERY_IDS, k=SIM_K, shortlist=50,
                              m_subspaces=2, k_codes=16, n_iter=2)


def q_embedding_znorm(sf_dir: str):
    """Per-dimension z-score standardization witness: one Gram fold for
    (mean, std) per dim, one broadcast scale pass emitting each vector's
    standardized L2 norm."""
    import ray.data as rd

    from .stages.similarity import embedding_standardize_norms

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return embedding_standardize_norms(emb)


def q_trainset_build(sf_dir: str):
    """Composed LLM training-set builder: curate (quality + exact dedup)
    -> survivor-corpus perplexity filter -> token chunking, one dataflow;
    the oracle recomputes the whole chain in one statement."""
    from .pipelines.trainset import build_trainset

    return build_trainset(sf_dir, ppl_threshold=40.0, window=32, stride=24)


def q_tagger_confusion(sf_dir: str):
    """Rule-vs-model confusion matrix: one fused corpus pass, label-vocab²
    exchange (no prediction-table join)."""
    from .pipelines.evalharness import tagger_confusion

    return tagger_confusion(sf_dir)


def q_tagger_kappa(sf_dir: str):
    """Cohen's kappa (chance-corrected agreement) between the two taggers."""
    from .pipelines.evalharness import tagger_kappa

    return tagger_kappa(sf_dir)


def q_token_budget_select(sf_dir: str):
    """Token-budget mixing: √size Hamilton apportionment + per-source
    ordered prefix selection."""
    from .pipelines.trainset import token_budget_select

    return token_budget_select(sf_dir, budget_tokens=20_000)


def q_pretrain_corpus(sf_dir: str):
    """Composed flagship: Gopher filter → exact dedup → curriculum order;
    oracle replays the whole chain in one statement."""
    from .pipelines.trainset import pretrain_corpus

    return pretrain_corpus(sf_dir, n_bands=8)


def q_curriculum_order(sf_dir: str):
    """Curriculum ordering: exact order-statistic length bands (histogram
    fold, no global sort) + stable md5 within-band shuffle key."""
    from .pipelines.trainset import curriculum_order

    return curriculum_order(sf_dir, n_bands=8)


def q_pack_bins(sf_dir: str):
    """Greedy first-fit sequence packing of docs into 256-token bins,
    parallel per source group (order-sensitive scan replayed by a
    recursive-CTE oracle)."""
    import ray.data as rd

    from .stages.seqprep import pack_bins

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    return pack_bins(docs, budget=256)


def q_dedup_exact(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.exact_dedup_groups(docs)


def q_dedup_minhash(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.minhash_lsh_pairs(docs)


def q_dedup_minhash_join(sf_dir: str):
    """Cross-corpus near-dup JOIN (even vs odd doc ids as the two corpora):
    side-aware LSH banding — signatures ship only for buckets holding both
    sides; the benchmark side never needs to be broadcastable."""
    import pyarrow.compute as pc

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def parity(p: int):
        return lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b["doc_id"], 1), p))

    left = docs.map_batches(parity(0), batch_format="pyarrow")
    right = docs.map_batches(parity(1), batch_format="pyarrow")
    return dedup.minhash_lsh_join(left, right)


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: MinHash pair list -> connected components via
    distributed min-label propagation; cluster_id = component min doc_id
    (the canonical survivor)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.connected_components(dedup.minhash_lsh_pairs(docs))


def q_dedup_best_survivors(sf_dir: str):
    """Quality-aware canonical per near-dup cluster (max n_chars)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])
    clusters = dedup.connected_components(
        dedup.minhash_lsh_pairs(docs.select_columns(["doc_id", "text"])))
    return dedup.best_survivor_per_cluster(
        docs.select_columns(["doc_id", "n_chars"]), clusters)


def q_dedup_survivors(sf_dir: str):
    """Dedup APPLY step — the piece that turns pair lists into a smaller
    corpus: MinHash pairs -> connected components -> LOSERS (doc_id !=
    cluster_id) -> distributed ANTI join back against the full document
    table.  Only loser KEYS are shuffled; document payloads stream through
    the anti join untouched."""
    import ray.data as rd

    from .stages.joins import hash_anti_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    clusters = dedup.connected_components(
        dedup.minhash_lsh_pairs(docs.select_columns(["doc_id", "text"])))
    losers = clusters.map_batches(
        lambda b: b.filter(pc.not_equal(b["doc_id"], b["cluster_id"])),
        batch_format="pyarrow")
    return hash_anti_join(docs, losers, on="doc_id")


def q_dedup_simhash(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.simhash_dedup(docs)


def q_kmv_set_ops(sf_dir: str):
    import ray.data as rd

    from .stages.sketch import kmv_set_ops

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return kmv_set_ops(ev)


def q_bpe_encode(sf_dir: str):
    import ray.data as rd

    from .stages.seqprep import bpe_encode

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bpe_encode(docs)


def q_bpe_train(sf_dir: str):
    import ray.data as rd

    from .stages.seqprep import bpe_train

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bpe_train(docs)


def q_unigram_seed(sf_dir: str):
    import ray.data as rd

    from .stages.seqprep import unigram_seed

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return unigram_seed(docs)


def q_unigram_train(sf_dir: str):
    """Unigram-LM (SentencePiece) tokenizer EM training — Viterbi hard-EM
    over the distributed word vocabulary; rows-only check, the DP is not
    SQL-expressible (seed statistics ARE oracle-gated via unigram_seed)."""
    import ray.data as rd

    from .stages.seqprep import unigram_train

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return unigram_train(docs)


def q_quality_lr(sf_dir: str):
    import ray.data as rd

    from .stages.classify import quality_logreg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "n_chars"])
    return quality_logreg(docs)


def q_quality_auc(sf_dir: str):
    import ray.data as rd

    from .stages.classify import binary_auc

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return binary_auc(docs)


def q_calibration(sf_dir: str):
    import ray.data as rd

    from .stages.classify import calibration_bins

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return calibration_bins(docs)


def q_dedup_setjoin(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.set_similarity_join(docs)


def q_dedup_ngram(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    return dedup.ngram_jaccard_pairs(docs)




def q_dedup_substring(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dedup.substring_window_pairs(docs, window=SUBSTR_WINDOW)


def q_dedup_embedding(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # 0.4: the synthetic embeddings top out near cos 0.51 — this exercises a
    # non-empty pair set at every sf (0.95 returned zero rows everywhere)
    return dedup.embedding_cosine_pairs(emb, threshold=EMB_DEDUP_THRESHOLD)


def q_semdedup(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return similarity.semdedup_prune(emb, k=8, n_iter=3,
                                     threshold=EMB_DEDUP_THRESHOLD)


def q_similarity_topk(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.brute_force_topk(emb, SIM_QUERY_IDS, k=SIM_K)


def q_label_noise(sf_dir: str):
    """kNN-majority label-noise scan over a 40-probe panel."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.label_noise_scan(emb, list(range(40)), k=10)


def q_mmr_rerank(sf_dir: str):
    """MMR diversified rerank over the brute-force pool; k greedy steps
    unrolled in the oracle (kg_hits technique)."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.mmr_rerank(emb, SIM_QUERY_IDS, k=5, pool=20, lam=0.7)


def q_similarity_filtered(sf_dir: str):
    """Filtered vector search: same-label top-k, mask applied BEFORE
    per-batch ranking (no post-filter recall loss)."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.filtered_topk(emb, SIM_QUERY_IDS, k=SIM_K)


def q_embedding_gram(sf_dir: str):
    """Distributed (n, Σx, XᵀX) fold: driver receives ONE 33 KiB state via
    AggregateFn tree merge, never O(n_blocks) partials."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    return similarity.embedding_gram(emb, dim=64)


def q_embedding_pca(sf_dir: str):
    """PCA projection (top-4 components) from the same one-pass fold;
    deterministic sign convention.  Non-SQL (eigh) → property-tested."""
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return similarity.embedding_pca(emb, dim=64, k=4)


def q_hard_negatives(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.hard_negatives(emb, SIM_QUERY_IDS, k=SIM_K)


def q_source_mixture(sf_dir: str):
    import ray.data as rd

    from .stages.corpus_stats import source_mixture_weights

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    return source_mixture_weights(docs)


def q_similarity_ivf(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.ivf_topk(emb, SIM_QUERY_IDS, k=SIM_K)


def q_similarity_lsh(sf_dir: str):
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_topk(emb, SIM_QUERY_IDS, k=SIM_K,
                               n_planes=SIM_LSH_PLANES,
                               n_tables=SIM_LSH_TABLES)


# ----------------------------------------------------------- interpretability

def q_interpret_occlusion(sf_dir: str):
    """A3: occlusion token attribution over the numpy NER model (SHAP/LIME
    family, library-free; reference model_evaluator.py:228-626).  Model
    scoring — rows-only check, no SQL oracle."""
    from .stages.interpret import token_attribution

    return token_attribution(kg.corpus_ds(sf_dir), limit=40)


# ---------------------------------------------------------------- multimodal

def q_multimodal_meta(sf_dir: str):
    ds = multimodal.decode_pipeline(kg.corpus_ds(sf_dir))
    return ds.select_columns(["message_id", "n_bytes", "media_type"])


def q_scene_changes(sf_dir: str):
    """Video scene-change detection: lag-delta over ordered sampled frames
    (per-payload), threshold boundaries."""
    return kg.corpus_ds(sf_dir).map_batches(
        multimodal.scene_change_batch, batch_format="pyarrow",
        batch_size=256)


def q_image_phash(sf_dir: str):
    """Perceptual hash per payload (average-hash family) — the image
    near-dup signal; feeds simhash-style hamming bucketing."""
    return kg.corpus_ds(sf_dir).map_batches(multimodal.phash_batch,
                                            batch_format="pyarrow")


def q_phash_cross_vendor(sf_dir: str):
    """Cross-vendor payload reuse: perceptual hashes shared by ≥2 distinct
    vendors (stolen/product-stock imagery signal).  One phash pass + one
    hash-keyed groupby with per-batch (phash, repo) distinct combiners."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(b: pa.Table) -> pa.Table:
        t = multimodal.phash_batch(b)
        t = t.append_column("repo", b["repo"])
        # block-local distinct (phash, repo) then count-1 partials
        d = (t.select(["phash", "repo"]).group_by(["phash", "repo"])
             .aggregate([]))
        return d.append_column(
            "one", pa.array([1] * d.num_rows, pa.int64()))

    per_vendor = (kg.corpus_ds(sf_dir)
                  .map_batches(partials, batch_format="pyarrow")
                  .groupby(["phash", "repo"])
                  .aggregate(Sum("one", alias_name="one")))

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({
            "phash": b["phash"],
            "n_vendors": pa.array([1] * b.num_rows, pa.int64()),
            "lo": b["repo"], "hi": b["repo"],
        })

    agg = (per_vendor.map_batches(fold, batch_format="pyarrow")
           .groupby("phash")
           .aggregate(Sum("n_vendors", alias_name="n_vendors"),
                      Min("lo", alias_name="first_vendor"),
                      Max("hi", alias_name="last_vendor")))
    import pyarrow.compute as pc

    return agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_vendors"], pa.scalar(2))),
        batch_format="pyarrow")


def q_multimodal_audio(sf_dir: str):
    """Audio frame windowing: actor-pool stage, vectorized code-point PCM
    stand-in, cumsum-of-squares window energies."""
    return multimodal.audio_window_pipeline(kg.corpus_ds(sf_dir),
                                            window=16, hop=8)


VPCT_LO, VPCT_HI, VPCT_BINS = 0.0, 512.0, 1024


def q_fuzzy_pairs(sf_dir: str):
    """Fuzzy-string blocking join: part-name surface forms within edit
    distance 1 (SymSpell deletion-neighborhood blocking)."""
    import ray.data as rd

    from .stages.fuzzy import fuzzy_form_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    return fuzzy_form_pairs(ds, col="p_name")


def q_value_percentiles(sf_dir: str):
    """Approx global percent-rank of each event value (histogram sketch)."""
    import ray.data as rd

    from .stages.sketch import value_percentiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    return value_percentiles(ds, col="value", id_col="event_id",
                             lo=VPCT_LO, hi=VPCT_HI, bins=VPCT_BINS)


def q_rolling_active(sf_dir: str):
    """7-day rolling approx distinct active users (windowed KMV merge)."""
    import ray.data as rd

    from .stages.sketch import rolling_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    return rolling_distinct(ds, ts_col="ts", id_col="user_id",
                            window_days=7, k=64)


def q_grouped_ndistinct(sf_dir: str):
    """Per-group KMV sketch: approx distinct users per event_type."""
    import ray.data as rd

    from .stages.sketch import grouped_ndistinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_ndistinct(ds, "event_type", "user_id", k=64)


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: textstats.repetition_batch(b, text_col="text"),
        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens", "top_token_frac",
                              "top_bigram_frac"])


def q_bigram_lm(sf_dir: str):
    """Add-1-smoothed bigram LM estimation over documents (top-100)."""
    import ray.data as rd

    from .stages.corpus_stats import bigram_lm

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_lm(docs, k_smooth=1.0, topn=100)


def q_top_domains(sf_dir: str):
    """URL-domain rollup over the message corpus: mentions + distinct
    vendor channels per domain."""
    from ray.data.aggregate import Count, Sum

    from .pipelines import kg as kgmod

    per_channel = (kgmod.corpus_ds(sf_dir)
                   .select_columns(["repo", "content"])
                   .map_batches(textstats.top_domains_batch,
                                batch_format="pyarrow")
                   .groupby(["repo", "domain"])
                   .aggregate(Sum("n", alias_name="n")))
    return (per_channel.groupby("domain")
            .aggregate(Sum("n", alias_name="n_mentions"),
                       Count(alias_name="n_vendors")))


def q_quantize_embeddings(sf_dir: str):
    """Int8 symmetric quantization of unit-normalized embeddings."""
    import ray.data as rd

    from .stages.similarity import quantize_embeddings

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return quantize_embeddings(ds)


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling (A-ES) over orders: heavier
    o_totalprice wins proportionally more often, shard-stable."""
    import ray.data as rd

    from .stages.corpus_stats import weighted_sample

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    return weighted_sample(ds, key_col="o_orderkey",
                           weight_col="o_totalprice", k=100)


def q_label_affinity(sf_dir: str):
    """Pairwise cosine similarity between per-label embedding centroids."""
    import ray.data as rd

    from .stages.similarity import label_affinity

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return label_affinity(ds)


def q_kmeans(sf_dir: str):
    """Distributed k-means (Lloyd's, k=8, 3 iterations, deterministic
    init) over the embedding corpus."""
    import ray.data as rd

    from .stages.similarity import kmeans

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans(ds, k=8, n_iter=3)


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (grouped vector mean, exploded to
    flat (label, dim, centroid) rows)."""
    import ray.data as rd

    from .stages.similarity import label_centroids

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])
    return label_centroids(ds)


def q_exact_quantiles(sf_dir: str):
    """Exact p50/p95/p99 of events.value via histogram locate + bin refine
    (no global sort)."""
    import ray.data as rd

    from .stages.sketch import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return exact_quantiles(ds, col="value", quantiles=(0.5, 0.95, 0.99),
                           lo=VPCT_LO, hi=VPCT_HI, bins=VPCT_BINS)


def q_doc_entropy(sf_dir: str):
    """Token-distribution Shannon entropy per document (quality signal)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: textstats.entropy_batch(b, text_col="text"),
        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens", "token_entropy"])


def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling plumbing (deterministic fake decode; rows-only
    check — the frame features are hash-derived, not SQL-expressible)."""
    ds = multimodal.frame_sample_pipeline(kg.corpus_ds(sf_dir))
    return ds.select_columns(["message_id", "frame_idx"])


# ------------------------------------------------------------ public surface

def entry() -> Any:
    """Flagship: full KG build at sf0.001 (materializes triples/nodes/edges +
    scorecard under /tmp), returns the triples Dataset."""
    sf = "/root/testdata/sf0.001"
    kg.build_kg(sf, "/tmp/kg_entry")
    return q_triples(sf)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship KG pipeline
        "corpus": q_corpus,
        "normalize": q_normalize,
        "normalize_stopwords": q_normalize_stopwords,
        "triples": q_triples,
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "vendor_scorecard": q_scorecard,
        # labeling / eval surface
        "bio_tags": q_bio_tags,
        "bio_tags_model": q_bio_tags_model,
        "train_prep": q_train_prep,
        "labeling_sheet": q_labeling_sheet,
        "conll_csv": q_conll_csv,
        "corpus_summary": q_corpus_summary,
        # text analysis
        "langid": q_langid,
        "token_counts": q_token_counts,
        "doc_quality": q_doc_quality,
        "gopher_rules": q_gopher_rules,
        "dedup_histogram": q_dedup_histogram,
        "expectations": q_expectations,
        "langid_confusion": q_langid_confusion,
        "doc_fingerprint": q_fingerprint,
        "token_topk": q_token_topk,
        "zipf_fit": q_zipf_fit,
        "token_topk_sketch": q_token_topk_sketch,
        "inverted_index": q_inverted_index,
        "token_pmi": q_token_pmi,
        "sessionize": q_sessionize,
        "compact_documents": q_compact,
        "embed_documents": q_embed_documents,
        "rel_salted_topk": q_salted_topk,
        "rel_pivot": relational.orders_pivot,
        "rel_running_totals": relational.running_totals,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "histogram_quantile": q_histogram_quantile,
        "tfidf_topk": q_tfidf,
        "bm25_topk": q_bm25,
        "asof_clicks": q_asof_clicks,
        "pii_scrub": q_pii_scrub,
        "rel_quantiles": relational.value_quantiles,
        # dedup suite
        "dedup_exact": q_dedup_exact,
        "curate_documents": q_curate,
        "approx_ndistinct": q_approx_ndistinct,
        "approx_ndistinct_hll": q_approx_ndistinct_hll,
        "countmin_topk": q_countmin_topk,
        "token_chunks": q_token_chunks,
        "doc_perplexity": q_doc_perplexity,
        "dsir_weights": q_dsir_weights,
        "bpe_pairs": q_bpe_pairs,
        "pack_bins": q_pack_bins,
        "trainset_build": q_trainset_build,
        "curriculum_order": q_curriculum_order,
        "pretrain_corpus": q_pretrain_corpus,
        "token_budget_select": q_token_budget_select,
        "tagger_confusion": q_tagger_confusion,
        "tagger_kappa": q_tagger_kappa,
        "pq_codes": q_pq_codes,
        "similarity_pq_adc": q_similarity_pq_adc,
        "similarity_pq_rerank": q_similarity_pq_rerank,
        "embedding_znorm": q_embedding_znorm,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "orc_roundtrip": q_orc_roundtrip,
        "feather_roundtrip": q_feather_roundtrip,
        "rel_waiting_suppliers": relational.waiting_suppliers,
        "rel_window_dedup": relational.window_dedup_events,
        "rel_gap_fill": relational.gap_fill_locf,
        "rel_ewma": relational.ewma_daily,
        "rel_decayed_activity": relational.decayed_activity,
        "rel_rfm_scores": relational.rfm_scores,
        "rel_late_events": relational.late_event_audit,
        "rel_daily_trend": relational.daily_trend,
        "rel_seasonal_anomalies": relational.seasonal_anomalies,
        "rel_small_qty_revenue": relational.small_quantity_revenue,
        "rel_priority_exists": relational.priority_order_counts,
        "rel_pushdown_scan": relational.pushdown_scan,
        "rel_partition_prune": relational.partitioned_write_prune,
        "kg_communities": kg.kg_label_propagation,
        "kg_random_walks": kg.kg_random_walks,
        "kg_walk_skipgrams": kg.kg_walk_skipgrams,
        "rel_nation_trade": tpch_ext.nation_trade_volume,
        "rel_market_share": tpch_ext.market_share,
        "rel_product_profit": tpch_ext.product_profit,
        "rel_promo_revenue": tpch_ext.promo_revenue,
        "rel_top_supplier": tpch_ext.top_supplier,
        "rel_supplier_cnt": tpch_ext.part_supplier_counts,
        "rel_disjunctive": tpch_ext.disjunctive_revenue,
        "rel_heavy_suppliers": tpch_ext.heavy_suppliers,
        "rel_min_cost_supplier": tpch_ext.min_cost_supplier,
        "rel_important_parts": tpch_ext.important_parts,
        "rel_priority_shipments": tpch_ext.priority_shipments,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_join": q_dedup_minhash_join,
        "dedup_clusters": q_dedup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "dedup_best_survivors": q_dedup_best_survivors,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram": q_dedup_ngram,
        "dedup_setjoin": q_dedup_setjoin,
        "quality_lr": q_quality_lr,
        "rag_retrieve": rag.rag_retrieve,
        "rag_rrf": lambda sf: rag.hybrid_rrf(sf, BM25_QUERY, k=20, pool=50),
        "entity_resolution": entity_res.entity_resolution,
        "bpe_train": q_bpe_train,
        "unigram_seed": q_unigram_seed,
        "unigram_train": q_unigram_train,
        "bpe_encode": q_bpe_encode,
        "kmv_set_ops": q_kmv_set_ops,
        "hard_negatives": q_hard_negatives,
        "source_mixture": q_source_mixture,
        "decontaminate": q_decontaminate,
        "rel_winsorized": relational.winsorized_means,
        "rel_mad": relational.grouped_mad,
        "rel_skyline": relational.part_skyline,
        "rel_topn_per_key": relational.topn_orders_per_customer,
        "rel_user_streaks": relational.user_streaks,
        "rel_chi2": relational.lang_source_chi2,
        "rel_psi": relational.value_psi,
        "quality_auc": q_quality_auc,
        "calibration": q_calibration,
        "rel_gini": relational.gini_user_spend,
        "dedup_substring": q_dedup_substring,
        "semdedup": q_semdedup,
        "dedup_embedding": q_dedup_embedding,
        # similarity search
        "similarity_topk": q_similarity_topk,
        "similarity_filtered": q_similarity_filtered,
        "mmr_rerank": q_mmr_rerank,
        "label_noise": q_label_noise,
        "embedding_gram": q_embedding_gram,
        "embedding_pca": q_embedding_pca,
        "similarity_lsh": q_similarity_lsh,
        "similarity_ivf": q_similarity_ivf,
        # multimodal plumbing
        "multimodal_meta": q_multimodal_meta,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_audio": q_multimodal_audio,
        "image_phash": q_image_phash,
        "phash_cross_vendor": q_phash_cross_vendor,
        "scene_changes": q_scene_changes,
        "interpret_occlusion": q_interpret_occlusion,
        # relational operator coverage
        "rel_filter_project": relational.filter_project_revenue,
        "rel_pricing_summary": relational.pricing_summary,
        "rel_top_order_per_customer": relational.top_order_per_customer,
        "rel_orders_by_segment": relational.orders_by_segment,
        "rel_top100_orders": relational.top100_orders,
        "rel_distinct": relational.distinct_status_priority,
        "rel_union": relational.union_shipdate_extremes,
        "rel_events_summary": relational.events_summary,
        "rel_hourly_windows": relational.hourly_event_windows,
        "rel_sliding_windows": relational.sliding_event_windows,
        "rel_shipping_priority": relational.shipping_priority,
        "rel_suppliers_by_region": relational.suppliers_by_region,
        "rel_revenue_by_brand": relational.revenue_by_brand,
        "rel_lag_lead": relational.lag_lead_events,
        "rel_bloom_semi_join": relational.urgent_lineitems,
        "rel_skew_join": relational.events_by_segment,
        "rel_upsert": relational.orders_upsert,
        "rel_range_join": relational.price_band_join,
        "rel_rollup": relational.orders_rollup,
        "rel_cube": relational.orders_cube,
        "rel_intersect": relational.customers_both_years,
        "rel_except": relational.customers_lapsed,
        "grouped_quantiles": q_grouped_quantiles,
        "contamination": q_contamination,
        "capped_sample": q_capped_sample,
        "trending_tokens": q_trending_tokens,
        # KG graph analytics
        "kg_degrees": kg.kg_degrees,
        "kg_cooccurrence": kg.kg_cooccurrence,
        "kg_pagerank": kg.kg_pagerank,
        "kg_hits": kg.kg_hits,
        "kg_ppr": kg.kg_ppr,
        "kg_edge_churn": kg.kg_edge_churn,
        "kg_link_prediction": kg.kg_link_prediction,
        "kg_components": kg.kg_components,
        "kg_wl_colors": kg.kg_wl_colors,
        "kg_butterflies": kg.kg_butterflies,
        "kg_alias_edges": kg.kg_alias_edges,
        "kg_edge_span": kg.kg_edge_span,
        "kg_closeness": kg.kg_closeness,
        "kg_edge_pmi": kg.kg_edge_pmi,
        "kg_negative_samples": kg.kg_negative_samples,
        "kg_truss": kg.kg_truss,
        # round-3 batch 2: sequence / window-frame / outer-join / graph /
        # quality-filter coverage
        "rel_funnel": relational.event_funnel,
        "rel_moving_avg": relational.daily_moving_avg,
        "rel_full_outer": relational.customers_year_outer,
        "rel_event_paths": relational.event_paths,
        "rel_triangles": relational.part_triangles,
        "rel_kcore": relational.part_kcore,
        "rel_assortativity": relational.part_assortativity,
        "rel_cohort": relational.user_cohorts,
        "rel_khop": relational.part_khop,
        "rel_assoc_rules": relational.assoc_rules,
        "rel_stream_join": relational.click_purchase_attribution,
        "rel_scd2": relational.scd2_user_state,
        "rel_transitions": relational.event_transitions,
        "rel_mode": relational.priority_mode_by_status,
        "rel_json_extract": relational.props_sum_by_key,
        "rel_returned_items": relational.returned_item_report,
        "rel_large_orders": relational.large_volume_customers,
        "rel_corr": relational.corr_by_returnflag,
        "rel_moments": relational.grouped_moments,
        "rel_custdist": relational.customer_order_distribution,
        "rel_idle_rich": relational.idle_rich_customers,
        "rel_zscore": relational.event_value_anomalies,
        "grouped_ndistinct": q_grouped_ndistinct,
        "rolling_active": q_rolling_active,
        "value_percentiles": q_value_percentiles,
        "fuzzy_pairs": q_fuzzy_pairs,
        "doc_repetition": q_doc_repetition,
        "doc_entropy": q_doc_entropy,
        "rel_ntile": relational.value_deciles,
        "exact_quantiles": q_exact_quantiles,
        "label_centroids": q_label_centroids,
        "label_affinity": q_label_affinity,
        "weighted_sample": q_weighted_sample,
        "rel_revenue_share": relational.nation_revenue_share,
        "rel_robust_means": relational.robust_means,
        "top_domains": q_top_domains,
        "quantize_embeddings": q_quantize_embeddings,
        "bigram_lm": q_bigram_lm,
        "rel_day_over_day": relational.day_over_day,
        "data_profile": relational.data_profile,
        "rel_missing_days": relational.missing_days,
        "rel_table_diff": relational.table_diff,
        "kmeans": q_kmeans,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "corpus": oracles.corpus_sql(),
        "normalize": oracles.normalize_sql(),
        "normalize_stopwords": oracles.normalize_stopwords_sql(),
        "triples": oracles.triples_sql(),
        "kg_nodes": oracles.kg_nodes_sql(),
        "kg_edges": oracles.kg_edges_sql(),
        "vendor_scorecard": oracles.scorecard_sql(),
        "bio_tags": oracles.bio_tags_sql(),
        "bio_tags_model": oracles.model_bio_tags_sql(),
        "train_prep": oracles.train_prep_sql(),
        "labeling_sheet": oracles.labeling_sheet_sql(50),
        "conll_csv": oracles.conll_csv_sql(),
        "corpus_summary": oracles.corpus_summary_sql(),
        "langid": oracles.langid_sql(),
        "token_counts": oracles.token_count_sql(),
        "doc_quality": oracles.quality_sql(),
        "gopher_rules": oracles.gopher_rules_sql(),
        "dedup_histogram": oracles.dedup_histogram_sql(),
        "expectations": oracles.expectations_report_sql(),
        "langid_confusion": oracles.langid_confusion_sql(),
        "dedup_exact": oracles.exact_dedup_sql(),
        "curate_documents": oracles.curate_documents_sql(),
        "similarity_topk": oracles.similarity_topk_sql(SIM_QUERY_IDS, SIM_K),
        "similarity_filtered": oracles.filtered_topk_sql(SIM_QUERY_IDS,
                                                         SIM_K),
        "mmr_rerank": oracles.mmr_rerank_sql(SIM_QUERY_IDS, k=5, pool=20,
                                             lam=0.7),
        "label_noise": oracles.label_noise_scan_sql(list(range(40)), 10),
        "embedding_gram": oracles.embedding_gram_sql(64),
        "multimodal_meta": oracles.multimodal_meta_sql(),
        "rel_filter_project": oracles.filter_project_revenue_sql(),
        "rel_pricing_summary": oracles.pricing_summary_sql(),
        "rel_top_order_per_customer": oracles.top_order_per_customer_sql(),
        "rel_orders_by_segment": oracles.orders_by_segment_sql(),
        "rel_top100_orders": oracles.top100_orders_sql(),
        "rel_distinct": oracles.distinct_status_priority_sql(),
        "rel_union": oracles.union_shipdate_extremes_sql(),
        "rel_events_summary": oracles.events_summary_sql(),
        "rel_hourly_windows": oracles.hourly_event_windows_sql(),
        "rel_sliding_windows": oracles.sliding_event_windows_sql(),
        "rel_shipping_priority": oracles.shipping_priority_sql(),
        "rel_suppliers_by_region": oracles.suppliers_by_region_sql(),
        "rel_revenue_by_brand": oracles.revenue_by_brand_sql(),
        # extension oracles (full independent SQL recompute — see each
        # generator's docstring for the mirrored arithmetic)
        "doc_fingerprint": oracles.fingerprint_sql(),
        "approx_ndistinct": oracles.approx_ndistinct_sql(),
        "approx_ndistinct_hll": oracles.approx_ndistinct_hll_sql(),
        "countmin_topk": oracles.countmin_topk_sql(100),
        "token_chunks": oracles.token_chunks_sql(32, 24),
        "doc_perplexity": oracles.doc_perplexity_sql(1.0),
        "dsir_weights": oracles.dsir_weights_sql("en", 1024),
        "bpe_pairs": oracles.bpe_pair_stats_sql(50),
        "pack_bins": oracles.pack_bins_sql(256),
        "trainset_build": oracles.trainset_build_sql(),
        "curriculum_order": oracles.curriculum_order_sql(8),
        "pretrain_corpus": oracles.pretrain_corpus_sql(8),
        "token_budget_select": oracles.token_budget_select_sql(20_000),
        "tagger_confusion": oracles.tagger_confusion_sql(),
        "tagger_kappa": oracles.tagger_kappa_sql(),
        "pq_codes": oracles.pq_codes_sql(2, 16, 2, 64),
        "similarity_pq_adc": oracles.pq_adc_topk_sql(SIM_QUERY_IDS, SIM_K,
                                                      2, 16, 2, 64),
        "similarity_pq_rerank": oracles.pq_adc_rerank_topk_sql(
            SIM_QUERY_IDS, SIM_K, 50, 2, 16, 2, 64),
        "embedding_znorm": oracles.embedding_znorm_sql(),
        "jsonl_roundtrip": oracles.jsonl_roundtrip_sql(),
        "orc_roundtrip": oracles.jsonl_roundtrip_sql(),
        "feather_roundtrip": oracles.jsonl_roundtrip_sql(),
        "rel_waiting_suppliers": oracles.waiting_suppliers_sql(100),
        "rel_window_dedup": oracles.window_dedup_events_sql(),
        "rel_gap_fill": oracles.gap_fill_locf_sql(),
        "rel_ewma": oracles.ewma_daily_sql(0.3),
        "rel_decayed_activity": oracles.decayed_activity_sql(0.9),
        "rel_rfm_scores": oracles.rfm_scores_sql(5),
        "rel_late_events": oracles.late_event_audit_sql(24),
        "rel_daily_trend": oracles.daily_trend_sql(),
        "rel_seasonal_anomalies": oracles.seasonal_anomalies_sql(3.0),
        "rel_small_qty_revenue": oracles.small_quantity_revenue_sql(0.5),
        "rel_priority_exists": oracles.priority_order_counts_sql(),
        "rel_pushdown_scan": oracles.pushdown_scan_sql(),
        "rel_partition_prune": oracles.partitioned_write_prune_sql(),
        "kg_communities": oracles.kg_label_propagation_sql(3),
        "kg_random_walks": oracles.kg_random_walks_sql(),
        "kg_walk_skipgrams": oracles.kg_walk_skipgrams_sql(),
        "rel_nation_trade": oracles.nation_trade_volume_sql("1998-01-01"),
        "rel_market_share": oracles.market_share_sql("NATION_3", "ASIA",
                                                     "PROMO"),
        "rel_product_profit": oracles.product_profit_sql("widget", 0.6),
        "rel_promo_revenue": oracles.promo_revenue_sql("1996-01-01",
                                                       "1996-02-01", "PROMO"),
        "rel_top_supplier": oracles.top_supplier_sql("1996-01-01",
                                                     "1996-04-01"),
        "rel_supplier_cnt": oracles.part_supplier_counts_sql("Brand#1",
                                                             1500.0),
        "rel_disjunctive": oracles.disjunctive_revenue_sql(),
        "rel_heavy_suppliers": oracles.heavy_suppliers_sql("widget", 0.2),
        "rel_min_cost_supplier": oracles.min_cost_supplier_sql(5, "EUROPE"),
        "rel_important_parts": oracles.important_parts_sql("EUROPE", 1.5),
        "rel_priority_shipments": oracles.priority_shipments_sql(
            "1996-01-01", "1997-01-01"),
        "dedup_ngram": oracles.ngram_jaccard_sql(),
        "dedup_setjoin": oracles.set_similarity_join_sql(5, 1, 2),
        "quality_lr": oracles.quality_logreg_sql("en", 0.5, 4),
        "rag_retrieve": oracles.rag_retrieve_sql(32, 24, 8, 5, 97),
        "rag_rrf": oracles.rag_rrf_sql(BM25_QUERY, k=20, pool=50),
        "entity_resolution": oracles.entity_resolution_sql("p_name", "part"),
        "bpe_train": oracles.bpe_train_sql(5),
        "unigram_seed": oracles.unigram_seed_sql(),
        "bpe_encode": oracles.bpe_encode_sql(5),
        "kmv_set_ops": oracles.kmv_set_ops_sql("click", "purchase", 64),
        "hard_negatives": oracles.hard_negatives_sql(SIM_QUERY_IDS, SIM_K),
        "source_mixture": oracles.source_mixture_weights_sql(),
        "decontaminate": oracles.decontaminate_sql(
            n=CONTAM_N, bench_mod=CONTAM_MOD, flag_threshold=CONTAM_FLAG),
        "rel_winsorized": oracles.winsorized_means_sql(0.1, 0.9),
        "rel_mad": oracles.grouped_mad_sql(),
        "rel_skyline": oracles.part_skyline_sql(),
        "rel_topn_per_key": oracles.topn_orders_per_customer_sql(3),
        "rel_user_streaks": oracles.user_streaks_sql(),
        "rel_chi2": oracles.lang_source_chi2_sql(),
        "rel_psi": oracles.value_psi_sql("2024-01-15", 10, 0.0, 400.0),
        "quality_auc": oracles.binary_auc_sql(),
        "calibration": oracles.calibration_bins_sql(),
        "rel_gini": oracles.gini_user_spend_sql(),
        "dedup_substring": oracles.substring_dedup_sql(SUBSTR_WINDOW),
        "semdedup": oracles.semdedup_sql(8, 3, EMB_DEDUP_THRESHOLD),
        "dedup_embedding": oracles.embedding_cosine_sql(EMB_DEDUP_THRESHOLD),
        "multimodal_frames": oracles.multimodal_frames_sql(),
        "multimodal_audio": oracles.audio_windows_sql(16, 8),
        "image_phash": oracles.image_phash_sql(8),
        "phash_cross_vendor": oracles.phash_cross_vendor_sql(8),
        "scene_changes": oracles.scene_changes_sql(5, 96),
        "token_topk": oracles.token_topk_sql(100),
        "zipf_fit": oracles.zipf_fit_sql(1000),
        "token_topk_sketch": oracles.token_topk_sketch_sql(100),
        "inverted_index": oracles.inverted_index_sql(20),
        "token_pmi": oracles.token_pmi_sql(5, 50),
        "compact_documents":
            "SELECT doc_id, text, lang, source FROM documents",
        "rel_salted_topk": oracles.salted_topk_sql(3),
        "rel_pivot": oracles.orders_pivot_sql(),
        "rel_running_totals": oracles.running_totals_sql(50),
        "embed_documents": oracles.embed_documents_sql(32),
        "sessionize": oracles.sessionize_sql(30),
        "hash_sample": oracles.hash_sample_sql(10),
        "stratified_sample": oracles.stratified_sample_sql(STRATA_RATES),
        "histogram_quantile": oracles.histogram_quantile_sql(
            HISTQ_QUANTILES, lo=HISTQ_LO, hi=HISTQ_HI, bins=HISTQ_BINS),
        "tfidf_topk": oracles.tfidf_topk_sql(3),
        "bm25_topk": oracles.bm25_topk_sql(BM25_QUERY, 20),
        "asof_clicks": oracles.asof_clicks_sql(),
        "pii_scrub": oracles.pii_scrub_sql(),
        "rel_quantiles": oracles.value_quantiles_sql(),
        "dedup_minhash": oracles.minhash_sql(),
        "dedup_minhash_join": oracles.minhash_join_sql(),
        "dedup_clusters": oracles.clusters_sql(oracles.minhash_sql()),
        "dedup_survivors":
            oracles.dedup_survivors_sql(oracles.minhash_sql()),
        "dedup_best_survivors":
            oracles.best_survivors_sql(oracles.minhash_sql()),
        "dedup_simhash": oracles.simhash_sql(),
        "similarity_lsh": oracles.lsh_topk_sql(SIM_QUERY_IDS, SIM_K,
                                               n_planes=SIM_LSH_PLANES,
                                               n_tables=SIM_LSH_TABLES),
        "similarity_ivf": oracles.ivf_topk_sql(SIM_QUERY_IDS, SIM_K),
        "rel_lag_lead": oracles.lag_lead_sql(),
        "rel_bloom_semi_join": oracles.bloom_semi_join_sql(),
        "rel_skew_join": oracles.skew_join_sql(),
        "rel_upsert": oracles.orders_upsert_sql(),
        "rel_range_join": oracles.price_band_join_sql(),
        "rel_rollup": oracles.orders_rollup_sql(),
        "rel_cube": oracles.orders_cube_sql(),
        "rel_intersect": oracles.customers_set_op_sql("intersect"),
        "rel_except": oracles.customers_set_op_sql("except"),
        "grouped_quantiles": oracles.grouped_histogram_quantile_sql(
            GHISTQ_QUANTILES, lo=GHISTQ_LO, hi=GHISTQ_HI, bins=GHISTQ_BINS),
        "contamination": oracles.contamination_sql(
            n=CONTAM_N, bench_mod=CONTAM_MOD, flag_threshold=CONTAM_FLAG),
        "capped_sample": oracles.per_group_capped_sample_sql(CAPPED_SAMPLE_K),
        "trending_tokens": oracles.trending_tokens_sql(3),
        "kg_degrees": oracles.kg_degrees_sql(),
        "kg_cooccurrence": oracles.kg_cooccurrence_sql(),
        "kg_pagerank": oracles.kg_pagerank_sql(),
        "kg_hits": oracles.kg_hits_sql(),
        "kg_ppr": oracles.kg_ppr_sql(),
        "kg_edge_churn": oracles.kg_edge_churn_sql("2024-07-01"),
        "kg_link_prediction": oracles.kg_link_prediction_sql(2, 50),
        "kg_components": oracles.kg_components_sql(),
        "kg_wl_colors": oracles.kg_wl_colors_sql(3),
        "kg_butterflies": oracles.kg_butterflies_sql(),
        "kg_alias_edges": oracles.kg_alias_edges_sql(),
        "kg_edge_span": oracles.kg_edge_span_sql(),
        "kg_closeness": oracles.kg_closeness_sql(4, 3),
        "kg_edge_pmi": oracles.kg_edge_pmi_sql(),
        "kg_negative_samples": oracles.kg_negative_samples_sql(2),
        "kg_truss": oracles.kg_truss_sql(6, 5),
        "rel_funnel": oracles.event_funnel_sql(24),
        "rel_moving_avg": oracles.daily_moving_avg_sql(7),
        "rel_full_outer": oracles.customers_year_outer_sql(1995, 2000),
        "rel_event_paths": oracles.event_paths_sql(40),
        "rel_triangles": oracles.part_triangles_sql(),
        "rel_kcore": oracles.part_kcore_sql(68, 8),
        "rel_assortativity": oracles.part_assortativity_sql(),
        "rel_cohort": oracles.user_cohorts_sql(),
        "rel_khop": oracles.part_khop_sql(42, 3),
        "rel_assoc_rules": oracles.assoc_rules_sql(20),
        "rel_stream_join": oracles.click_purchase_attribution_sql(60),
        "rel_scd2": oracles.scd2_user_state_sql(),
        "rel_transitions": oracles.event_transitions_sql(),
        "rel_mode": oracles.priority_mode_sql(),
        "rel_json_extract": oracles.props_sum_by_key_sql(),
        "rel_returned_items": oracles.returned_item_report_sql(20),
        "rel_large_orders": oracles.large_volume_customers_sql(250.0),
        "rel_corr": oracles.corr_by_returnflag_sql(),
        "rel_moments": oracles.grouped_moments_sql(),
        "rel_custdist": oracles.customer_order_distribution_sql(),
        "rel_idle_rich": oracles.idle_rich_customers_sql(),
        "rel_zscore": oracles.event_value_anomalies_sql(2.5),
        "grouped_ndistinct": oracles.grouped_ndistinct_sql(64),
        "rolling_active": oracles.rolling_distinct_sql(7, 64),
        "value_percentiles": oracles.value_percentiles_sql(
            VPCT_LO, VPCT_HI, VPCT_BINS),
        "fuzzy_pairs": oracles.fuzzy_pairs_sql(),
        "doc_repetition": oracles.doc_repetition_sql(),
        "doc_entropy": oracles.doc_entropy_sql(),
        "rel_ntile": oracles.value_deciles_sql(10),
        "exact_quantiles": oracles.exact_quantiles_sql((0.5, 0.95, 0.99)),
        "label_centroids": oracles.label_centroids_sql(6),
        "label_affinity": oracles.label_affinity_sql(6),
        "weighted_sample": oracles.weighted_sample_sql(100),
        "rel_revenue_share": oracles.nation_revenue_share_sql(),
        "rel_robust_means": oracles.robust_means_sql(),
        "top_domains": oracles.top_domains_sql(),
        "quantize_embeddings": oracles.quantize_embeddings_sql(127),
        "bigram_lm": oracles.bigram_lm_sql(1.0, 100),
        "rel_day_over_day": oracles.day_over_day_sql(),
        "data_profile": oracles.data_profile_sql(),
        "rel_missing_days": oracles.missing_days_sql(),
        "rel_table_diff": oracles.table_diff_sql(),
        "kmeans": oracles.kmeans_sql(8, 3),
    }
