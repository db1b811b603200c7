"""Composed RAG index-and-retrieve pipeline (round 3, batch 7).

chunk → embed → retrieve, wired end-to-end the way a retrieval-augmented
corpus is actually built: the document table is exploded into overlapping
token windows (`seqprep.chunk_batch`, vectorized), every chunk is embedded
by an actor-pool stage (model state built once per actor —
`functions/np_model.HashEmbedder` stands in for a sentence-transformer
behind the same contract), and a broadcast query matrix retrieves the
global top-k chunks per query by exact cosine.

Reference analog: none (the reference has no retrieval stack) — this is
the LLM-pipeline extension composing three already-gated operators
(token_chunks, embed_documents, similarity_topk), and the oracle
recomputes the WHOLE chain in one SQL statement, verifying the
composition rather than the parts.

Scale notes: chunks stream (never materialized whole); the query matrix
ships once via ``ray.put``; each batch contributes a k-row partial top-k
per query, so the driver merges O(k · n_queries · n_blocks) rows — the
brute_force_topk shape.  Ranking uses the 6-dp-rounded cosine (ties then
broken by chunk key) so float mean-order noise at 1e-16 cannot flip a
rank between the engine and any recompute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.np_model import HashEmbedder
from ..stages.seqprep import chunk_batch


def _r6(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5) / 1e6   # cosines here are non-negative


class _ChunkEmbedStage:
    """Actor-pool chunk embedder: HashEmbedder built once per actor."""

    def __init__(self, dim: int = 8):
        self.model = HashEmbedder(dim=dim)
        self.dim = dim

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b["chunk_text"].to_pylist()
        mat = np.stack([self.model.embed(t) for t in texts])
        return pa.table({
            "doc_id": b["doc_id"],
            "chunk_id": b["chunk_id"],
            "emb": pa.array(list(mat), pa.list_(pa.float64())),
        })


class _DocScoreStage:
    """Actor-pool fused embed+score kernel for the dense side of hybrid
    retrieval: HashEmbedder (md5 token-vector cache) built once per actor,
    the unit query vector in the constructor args; each batch mean-pools
    its docs, computes the 6-dp-rounded cosine and emits ONLY its local
    top-``pool`` rows — document embeddings are never materialized."""

    def __init__(self, qvec: np.ndarray, pool: int, dim: int):
        self.model = HashEmbedder(dim=dim)
        qn = float(np.linalg.norm(qvec))
        self.qunit = qvec / (qn if qn else 1.0)
        self.pool = pool

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, cosines = [], []
        for did, text in zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()):
            v = self.model.embed(text)
            if v is None:
                continue
            n = float(np.linalg.norm(v))
            ids.append(did)
            cosines.append(float(v @ self.qunit) / (n if n else 1.0))
        ids_a = np.asarray(ids, dtype=np.int64)
        cos_a = _r6(np.asarray(cosines, dtype=np.float64))
        order = np.lexsort((ids_a, -cos_a))[:min(self.pool, len(ids_a))]
        return pa.table({
            "doc_id": pa.array(ids_a[order], pa.int64()),
            "cosine": pa.array(cos_a[order], pa.float64()),
        })


def hybrid_rrf(sf_dir: str, query_terms: list[str], *, k: int = 20,
               pool: int = 50, dim: int = 32, rrf_k: int = 60):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009): BM25 ranks and dense-cosine ranks over the SAME
    document table, fused as ``Σ_systems 1 / (rrf_k + rank)`` over the
    union of the two top-``pool`` lists (a system that didn't retrieve a
    doc contributes 0) — the standard first-stage ranker in front of a
    re-ranker, and the composition bm25_topk + embed_documents were built
    to feed.  Reference analog: none (LLM-pipeline retrieval extension).

    Shape: TWO streaming passes over the pruned (doc_id, text) projection —
    the bm25_topk pass (query-term df combiner + broadcast-idf partial
    top-k) and one fused embed+score actor-pool pass (per-batch partial
    top-``pool``; embeddings never stored).  Fusion happens driver-side on
    ≤ 2·pool rows.  Ranks use the 6-dp-rounded scores with doc_id
    tie-breaks, so float noise cannot flip a rank vs the oracle.

    Output: (doc_id, rrf, rank_bm25, rank_dense) — top-``k`` by
    (rrf desc, doc_id asc); absent-side ranks are NULL."""
    from ..stages.corpus_stats import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    sparse = bm25_topk(docs, query_terms, k=pool)      # (doc_id, bm25) sorted
    sparse = sparse.assign(
        rank_bm25=np.arange(1, len(sparse) + 1, dtype=np.int64))

    model = HashEmbedder(dim=dim)
    terms = sorted(set(query_terms))
    qvec = np.mean([model.token_vec(t) for t in terms], axis=0)

    parts = (docs.map_batches(
        _DocScoreStage, batch_size=4096, concurrency=2,
        fn_constructor_kwargs={"qvec": qvec, "pool": pool, "dim": dim},
        batch_format="pyarrow").to_pandas())           # ≤ pool × blocks rows
    dense = (parts.sort_values(["cosine", "doc_id"],
                               ascending=[False, True])
             .head(pool).reset_index(drop=True))
    dense = dense.assign(
        rank_dense=np.arange(1, len(dense) + 1, dtype=np.int64))

    fused = sparse[["doc_id", "rank_bm25"]].merge(
        dense[["doc_id", "rank_dense"]], on="doc_id", how="outer")
    rs = fused["rank_bm25"].to_numpy(np.float64, na_value=np.nan)
    rd_ = fused["rank_dense"].to_numpy(np.float64, na_value=np.nan)
    score = (np.where(np.isnan(rs), 0.0, 1.0 / (rrf_k + rs))
             + np.where(np.isnan(rd_), 0.0, 1.0 / (rrf_k + rd_)))
    fused = fused.assign(rrf=_r6(score)).astype(
        {"rank_bm25": "Int64", "rank_dense": "Int64"})
    return (fused.sort_values(["rrf", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True)
            [["doc_id", "rrf", "rank_bm25", "rank_dense"]])


def rag_retrieve(sf_dir: str, *, window: int = 32, stride: int = 24,
                 dim: int = 8, k: int = 5, query_mod: int = 97):
    """Top-``k`` chunks per query by exact cosine; queries are the FIRST
    chunk of every doc with ``doc_id % query_mod == 0``.  Output one row
    per (query_doc, rank): the retrieved chunk key and its cosine."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def to_chunks(b: pa.Table) -> pa.Table:
        return chunk_batch(b, text_col="text", id_col="doc_id",
                           window=window, stride=stride)

    def embed(ds):
        return ds.map_batches(_ChunkEmbedStage, batch_size=512,
                              concurrency=2,
                              fn_constructor_kwargs={"dim": dim},
                              batch_format="pyarrow")

    # the query side is computed on its own TINY pruned path (1/query_mod
    # of the corpus, first chunk only) — the corpus chunk embeddings are
    # NEVER materialized: they stream once through the scoring pass below
    def pick_query_docs(b: pa.Table) -> pa.Table:
        dids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        return b.filter(pa.array(dids % query_mod == 0))

    def first_chunk(b: pa.Table) -> pa.Table:
        cids = np.asarray(b["chunk_id"].to_pylist(), dtype=np.int64)
        return b.filter(pa.array(cids == 0))

    qtab = (embed(docs.map_batches(pick_query_docs, batch_format="pyarrow")
                  .map_batches(to_chunks, batch_format="pyarrow")
                  .map_batches(first_chunk, batch_format="pyarrow"))
            .to_pandas().sort_values("doc_id"))
    embs = embed(docs.map_batches(to_chunks, batch_format="pyarrow"))
    qmat = np.stack(qtab["emb"].to_numpy())
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    qunit = qmat / qnorm[:, None]
    qids = qtab["doc_id"].to_numpy().astype(np.int64)
    ref = ray.put((qids, qunit))

    def partial_topk(b: pa.Table) -> pa.Table:
        q_ids, q_unit = ray.get(ref)
        dids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        cids = np.asarray(b["chunk_id"].to_pylist(), dtype=np.int64)
        mat = np.stack(b["emb"].to_numpy(zero_copy_only=False))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = _r6((mat / norms[:, None]) @ q_unit.T)       # (batch, nq)
        kk = min(k, len(dids))
        out = {"query_doc": [], "doc_id": [], "chunk_id": [], "cosine": []}
        for qi in range(len(q_ids)):
            col = cos[:, qi]
            order = np.lexsort((cids, dids, -col))[:kk]
            out["query_doc"].extend([q_ids[qi]] * len(order))
            out["doc_id"].extend(dids[order].tolist())
            out["chunk_id"].extend(cids[order].tolist())
            out["cosine"].extend(col[order].tolist())
        return pa.table({
            "query_doc": pa.array(out["query_doc"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "chunk_id": pa.array(out["chunk_id"], pa.int64()),
            "cosine": pa.array(out["cosine"], pa.float64()),
        })

    partials = (embs.map_batches(partial_topk, batch_format="pyarrow")
                .to_pandas())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "doc_id", "chunk_id"],
                          ascending=[False, True, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (partials.groupby("query_doc", group_keys=False)
           .apply(final)
           .reset_index(drop=True))
    return (out[["query_doc", "rank", "doc_id", "chunk_id", "cosine"]]
            .sort_values(["query_doc", "rank"]).reset_index(drop=True))
