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
