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


def curriculum_order(sf_dir: str, *, n_bands: int = 8):
    """Curriculum data ordering (Bengio et al. 2009, as applied to LLM
    data prep): bucket documents into ``n_bands`` ascending-length bands
    (short → long ≈ easy → hard), then pseudo-shuffle within each band by
    a stable per-doc hash.  The (band, shuffle_key, doc_id) lexicographic
    order is the presentation order a curriculum dataloader consumes.

    Scale shape — no global sort, no per-row rank shuffle:

    1. Band boundaries are EXACT order statistics of the length
       distribution, computed from a per-block Arrow ``group_by`` length
       histogram folded through one native Sum groupby.  The shuffle
       payload is the distinct-length vocabulary (bounded by max doc
       length), never the corpus; the driver folds one row per distinct
       length.
    2. Assignment is a single streaming vectorized pass:
       ``np.searchsorted`` against the broadcast boundary array plus the
       repo-standard ``md5_number_lower`` key hash (shard-stable, no RNG
       state — reproducible across runs and cluster sizes).

    Boundary semantics: band k (1-based) covers scores ≤ the score at
    ascending rank ``ceil(k·n/B)`` (ties share a band — all equal-length
    docs land together, so the split is deterministic without a tie-break
    rank).  Mirrored exactly by the SQL oracle via ``row_number`` order
    statistics.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return curriculum_order_ds(ds, n_bands=n_bands)


def curriculum_order_ds(ds, *, n_bands: int = 8):
    """Core of ``curriculum_order`` over any (doc_id, text) dataset —
    also the final stage of the composed ``pretrain_corpus`` pipeline."""
    import numpy as np

    from ..stages.dedup import _stable_u64

    def hist_partial(b: pa.Table) -> pa.Table:
        score = pc.utf8_length(pc.coalesce(b["text"], pa.scalar("")))
        t = pa.table({"score": pc.cast(score, pa.int64())})
        return (t.group_by(["score"]).aggregate([([], "count_all")])
                .rename_columns(["score", "cnt"]))

    from ray.data.aggregate import Sum
    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("score").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("score").reset_index(drop=True))
    counts = hist["cnt"].to_numpy(dtype=np.int64)
    scores = hist["score"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    # boundary rank ceil(k*n/B) → first distinct score whose cumulative
    # count reaches it (== the score at that ascending rank)
    ranks = np.array([-(-k * n // n_bands) for k in range(1, n_bands)],
                     dtype=np.int64)
    bounds = scores[np.searchsorted(cum, ranks, side="left")] \
        if n else np.array([], dtype=np.int64)

    def assign(b: pa.Table) -> pa.Table:
        score = pc.cast(
            pc.utf8_length(pc.coalesce(b["text"], pa.scalar(""))),
            pa.int64()).to_numpy(zero_copy_only=False)
        band = np.searchsorted(bounds, score, side="left") + 1
        ids = b["doc_id"].to_pylist()
        key = np.fromiter(
            (_stable_u64(str(i)) % (1 << 63) for i in ids),
            np.int64, len(ids))
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(score, pa.int64()),
            "band": pa.array(band.astype(np.int64), pa.int64()),
            "shuffle_key": pa.array(key, pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def pretrain_corpus(sf_dir: str, *, n_bands: int = 8,
                    num_partitions: int = 16):
    """The composed pre-training corpus builder — this round's flagship
    chain, each stage the already-gated operator:

        Gopher-rules quality filter → exact dedup (sha256, keep-lowest-id)
        → curriculum ordering (length bands + stable shuffle key)

    Wiring: the filter fuses rule evaluation and the keep predicate into
    one streaming pass; dedup winners come back via the reduce-side
    ``hash_semi_join`` (id-only shuffle); the survivor boundary is
    materialized once (production checkpoints it) because the curriculum
    stage consumes it twice (histogram + assign).  The DuckDB oracle
    replays the WHOLE chain in one statement, so the composition — not
    just the parts — is verified."""
    from ..stages.joins import hash_semi_join
    from ..stages.textstats import gopher_rules_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def keep_pass(b: pa.Table) -> pa.Table:
        flags = gopher_rules_batch(b, text_col="text")
        return b.filter(pc.equal(flags["keep"], pa.scalar(1, pa.int64())))

    kept = docs.map_batches(keep_pass, batch_format="pyarrow")

    from ..stages.dedup import exact_dedup_groups
    winners = (exact_dedup_groups(kept)
               .select_columns(["keep_id"]).rename_columns(["doc_id"]))
    surv = hash_semi_join(kept, winners, on="doc_id",
                          num_partitions=num_partitions).materialize()
    return curriculum_order_ds(surv, n_bands=n_bands)


def token_budget_select(sf_dir: str, *, budget_tokens: int = 20_000):
    """Token-budget data mixing: apportion a global training-token budget
    across sources by the sub-linear √size rule (small sources upsampled
    relative to their share — the standard mixing heuristic), using
    Hamilton largest-remainder apportionment (exact, sums to the budget),
    then keep each source's doc_id-ordered prefix until its allocation is
    exhausted (first doc to EXCEED the allocation is cut).

    Shape: per-source token totals from one combiner groupby (source
    vocabulary is tiny → driver apportions); selection is a per-source
    ordered cumulative-sum scan in ``map_groups`` (the sessionize/ewma
    one-key-stream contract).  Output:
    (doc_id, source, n_tokens, cum_tokens)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def tok_pass(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(b["text"], pa.scalar("")), r"\S+")
        return pa.table({
            "doc_id": b["doc_id"], "source": b["source"],
            "n_tokens": pc.cast(n, pa.int64()),
        })

    toks = ds.map_batches(tok_pass, batch_format="pyarrow").materialize()

    totals = (toks.map_batches(
        lambda b: (b.select(["source", "n_tokens"])
                   .group_by(["source"]).aggregate([("n_tokens", "sum")])
                   .rename_columns(["source", "t"])),
        batch_format="pyarrow")
        .groupby("source").aggregate(Sum("t", alias_name="t"))
        .to_pandas().sort_values("source").reset_index(drop=True))

    sq = np.sqrt(totals["t"].to_numpy(dtype=np.float64))
    # op order mirrors the SQL exactly (B·√t/Σ√t) so floor/frac agree
    quota = budget_tokens * sq / sq.sum()
    alloc = np.floor(quota).astype(np.int64)
    rem = int(budget_tokens - alloc.sum())
    # largest fractional part first; ties by source name asc (stable sort
    # on (-frac, source) — identical ordering in the SQL mirror)
    order = sorted(range(len(alloc)),
                   key=lambda i: (-(quota[i] - alloc[i]),
                                  totals["source"].iloc[i]))
    for i in order[:rem]:
        alloc[i] += 1
    alloc_map = dict(zip(totals["source"], alloc.tolist()))

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        cum = g["n_tokens"].cumsum()
        keep = cum <= alloc_map[g["source"].iloc[0]]
        out = g.loc[keep, ["doc_id", "source", "n_tokens"]].copy()
        out["cum_tokens"] = cum[keep]
        return out

    return toks.groupby("source").map_groups(select, batch_format="pandas")
