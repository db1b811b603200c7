"""The composed LLM training-set builder — the end-to-end story the
individual operators exist for, as ONE gated dataflow:

    quality filter → exact dedup (curate) → corpus-LM perplexity filter
    → fixed-window token chunking

Every stage is the already-gated operator (curate.curate_dataset,
seqprep.doc_perplexity, seqprep.token_chunks) wired together with the
reduce-side semi join; the DuckDB oracle recomputes the whole chain in
one SQL statement, so the COMPOSITION is verified, not just the parts.

Scale notes: the curated survivor corpus is materialized once (in
production it is checkpointed to partitioned Parquet by the curate
pipeline's manifest machinery — the materialize here stands in for that
boundary); the perplexity LM is trained on the survivors themselves,
CCNet-style; chunking streams.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.joins import hash_semi_join
from ..stages.seqprep import doc_perplexity, token_chunks
from .curate import curate_dataset


def build_trainset(sf_dir: str, *, ppl_threshold: float = 40.0,
                   window: int = 32, stride: int = 24,
                   num_partitions: int = 16):
    """documents → curated survivors → ppl ≤ threshold → token chunks.
    Output: (doc_id, chunk_id, start, n_tokens, chunk_text), sorted."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    surv_ids = (curate_dataset(docs, num_partitions=num_partitions)
                .select_columns(["doc_id"]))
    kept = hash_semi_join(docs, surv_ids, on="doc_id",
                          num_partitions=num_partitions)
    # survivor-corpus boundary: two consumers (LM vocab pass + term pass)
    # and the final chunk pass — production checkpoints this to Parquet
    kept = kept.materialize()

    ppl = doc_perplexity(kept, k_smooth=1.0,
                         num_partitions=num_partitions)
    low_ppl = (ppl.map_batches(
        lambda b: b.filter(pc.less_equal(b["ppl"],
                                         pa.scalar(ppl_threshold))),
        batch_format="pyarrow").select_columns(["doc_id"]))
    final = hash_semi_join(kept, low_ppl, on="doc_id",
                           num_partitions=num_partitions)
    return token_chunks(final, window=window, stride=stride)
