"""Training-sequence preparation operators: fixed-window token chunking
(the "split long documents into context windows" pass every LLM training
pipeline runs before packing) and corpus-LM perplexity scoring (the
classic quality filter — score each document under a smoothed unigram
model estimated from the corpus itself, CCNet-style).

Both are expressed Ray-Data-first:

- chunking is a stateless vectorized explode (`map_batches` over Arrow;
  one re2 split + numpy offset arithmetic + an Arrow `take` gather —
  token strings never round-trip through Python objects);
- perplexity is two passes wired as dataflow, with the token-probability
  table joined back via a DISTRIBUTED hash join (`Dataset.join`) rather
  than a driver-side broadcast, so the vocabulary never has to fit on one
  node (at 100 TB a web-scale vocab runs to 10^8+ types).

Reference anchor: the reference tokenizes with whitespace semantics
(`src/data_preprocessing/text_preprocessor.py:201-233`); these operators
reuse the plain whitespace token stream the rest of the corpus-stats
suite (token_topk, tfidf_topk) standardizes on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ws_tokens(col: pa.ChunkedArray | pa.Array):
    """Whitespace token stream with empties removed: (flat Arrow string
    array, int64 per-doc token counts).  Vectorized — one re2 split over
    the column, offset arithmetic for the rest; tokens stay in Arrow."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    lists = pc.split_pattern_regex(arr, pattern=r"\s+")
    flat = lists.flatten()
    offs = np.asarray(lists.offsets, dtype=np.int64)
    mask = pc.not_equal(flat, "")
    mask_np = mask.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(arr), dtype=np.int64), np.diff(offs))
    n = np.bincount(doc_of[mask_np], minlength=len(arr)).astype(np.int64)
    return flat.filter(mask), n


def chunk_batch(batch: pa.Table, *, text_col: str = "text",
                id_col: str = "doc_id", window: int = 32,
                stride: int = 24) -> pa.Table:
    """Explode each document into fixed-size token windows.

    Window starts run 0, stride, 2·stride, … while start < n_tokens; each
    chunk is tokens[start : start+window] re-joined with single spaces.
    Overlap (stride < window) is the standard trick that keeps training
    examples from losing cross-boundary context.  Empty documents emit no
    chunks.

    Fully vectorized: the overlapping slices are materialized by one
    np.repeat/cumsum gather (`pc.take` on the flat token array), rebuilt
    as an Arrow list column, and joined with `pc.binary_join` — no Python
    loop over rows, chunks, or tokens."""
    flat, n = _ws_tokens(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_flat_off = np.concatenate([[0], np.cumsum(n)])[:-1]

    n_chunks = -(-n // stride)  # ceil; empty docs stay 0
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "start": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    chunk_off = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_id = np.arange(total, dtype=np.int64) - chunk_off[doc_idx]
    start = chunk_id * stride
    length = np.minimum(window, n[doc_idx] - start)

    tok_off = np.concatenate([[0], np.cumsum(length)])
    within = np.arange(int(tok_off[-1]), dtype=np.int64) \
        - np.repeat(tok_off[:-1], length)
    gather = np.repeat(doc_flat_off[doc_idx] + start, length) + within
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(tok_off, pa.int32()),
        pc.take(flat, pa.array(gather, pa.int64())))
    return pa.table({
        id_col: pa.array(ids[doc_idx], pa.int64()),
        "chunk_id": pa.array(chunk_id, pa.int64()),
        "start": pa.array(start, pa.int64()),
        "n_tokens": pa.array(length, pa.int64()),
        "chunk_text": pc.binary_join(chunk_lists, " "),
    })


def token_chunks(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 32, stride: int = 24):
    """Dataset-level chunker: one stateless map_batches stage, streaming.
    Output (doc_id, chunk_id, start, n_tokens, chunk_text), sorted for the
    deterministic gate; at scale drop the sort and write partitioned."""
    out = docs_ds.map_batches(
        lambda b: chunk_batch(b, text_col=text_col, id_col=id_col,
                              window=window, stride=stride),
        batch_format="pyarrow")
    return out.sort([id_col, "chunk_id"])


def doc_term_counts_batch(batch: pa.Table, *, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """(doc_id, token, c) term counts.  Exact per document because each
    document is one row — no cross-batch combine needed.  One Arrow C++
    hash group_by per batch; no Python token handling."""
    flat, n = _ws_tokens(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "token": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
    t = pa.table({"d": pa.array(doc_of, pa.int64()), "token": flat})
    g = t.group_by(["d", "token"]).aggregate([("d", "count")])
    d = g["d"].to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids[d], pa.int64()),
                     "token": g["token"],
                     "c": pc.cast(g["d_count"], pa.int64())})


def doc_perplexity(docs_ds, *, text_col: str = "text",
                   id_col: str = "doc_id", k_smooth: float = 1.0,
                   num_partitions: int = 16):
    """Per-document perplexity under the add-k-smoothed unigram LM
    estimated from the corpus itself (the CCNet/Gopher-style LM quality
    signal, with the corpus standing in for an external clean LM).

    p(t) = (count(t) + k) / (N + k·V);  ppl(d) = exp(−Σ c·ln p / Σ c).

    Scale shape: the vocabulary comes from a combiner groupby (per-batch
    Arrow hash-count partials → native Sum), per-doc term vectors meet it
    in a DISTRIBUTED hash join keyed on token — no driver collect, no
    vocab broadcast — then one groupby(doc_id) merges the weighted
    log-probs.  Only two scalars (N, V) touch the driver.  The corpus is
    deliberately re-scanned (column-pruned) for the second pass instead of
    materialized: at 100 TB a second streaming read beats pinning the
    whole corpus in the object store."""
    from ray.data.aggregate import Sum

    def vocab_partials(b: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(b[text_col])
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = (pa.table({"token": flat}).group_by("token")
             .aggregate([("token", "count")]))
        return pa.table({"token": g["token"],
                         "n": pc.cast(g["token_count"], pa.int64())})

    vocab = (docs_ds.map_batches(vocab_partials, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .materialize())  # vocabulary-sized; two consumers below
    n_total = float(vocab.aggregate(Sum("n", alias_name="N"))["N"])
    v_size = float(vocab.count())

    terms = docs_ds.map_batches(
        lambda b: doc_term_counts_batch(b, text_col=text_col,
                                        id_col=id_col),
        batch_format="pyarrow")
    # reduce-side lookup join (joins.hash_lookup_join): attaches the raw
    # vocab count n to every (doc, token) term; log-probs are computed
    # post-join from the two broadcast scalars (N, V).  Dataset.join is
    # avoided — Ray 2.49 finalizes empty partitions to zero-column blocks
    # (see dedup.connected_components).
    from .joins import hash_lookup_join

    joined = hash_lookup_join(terms, vocab, on="token",
                              num_partitions=num_partitions)

    def weight(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log((n + k_smooth) / (n_total + k_smooth * v_size))
        return pa.table({id_col: b[id_col],
                         "c": b["c"],
                         "wlp": pa.array(c * lp, pa.float64())})

    agg = (joined.map_batches(weight, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Sum("c", alias_name="n_tokens"),
                      Sum("wlp", alias_name="sum_logp")))

    def finalize(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["sum_logp"].to_numpy(zero_copy_only=False)
        ppl = np.round(np.exp(-s / nt), 6)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pc.cast(b["n_tokens"], pa.int64()),
                         "ppl": pa.array(ppl, pa.float64())})

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort(id_col))


def pack_bins(docs_ds, *, budget: int = 256, group_col: str = "source",
              text_col: str = "text", id_col: str = "doc_id"):
    """Greedy first-fit-in-order sequence packing: within each group, docs
    (in ascending id order) fill a bin until the next doc would overflow
    ``budget`` tokens, then a new bin starts — the example-packing pass
    that turns a chunked corpus into fixed-budget training batches without
    splitting documents.  Oversized docs (> budget) get a bin of their own.

    Packing is ORDER-SENSITIVE, hence sequential *by definition* — but
    only within a group: groups pack in parallel via groupby(group_col)
    .map_groups, the same per-key-stream shape (and the same partitioning
    assumption: one group's doc list fits a worker) as sessionize.  Token
    counts are pre-computed vectorized (map_batches) so the sequential
    kernel touches two int columns, never text.

    Output: (group_col, doc_id, n_tokens, bin) sorted; bin ids restart at
    0 per group."""

    def count_tokens(b: pa.Table) -> pa.Table:
        _, n = _ws_tokens(b[text_col])
        return pa.table({group_col: b[group_col],
                         id_col: b[id_col],
                         "n_tokens": pa.array(n, pa.int64())})

    def pack(g: "pd.DataFrame"):
        import pandas as pd
        g = g.sort_values(id_col)
        n = g["n_tokens"].to_numpy()
        bins = np.empty(len(n), dtype=np.int64)
        cur_bin, fill = 0, 0
        for i, tok in enumerate(n):
            if fill + tok > budget and fill > 0:
                cur_bin += 1
                fill = 0
            bins[i] = cur_bin
            fill += tok
        return pd.DataFrame({group_col: g[group_col].to_numpy(),
                             id_col: g[id_col].to_numpy(),
                             "n_tokens": n,
                             "bin": bins})

    out = (docs_ds.map_batches(count_tokens, batch_format="pyarrow")
           .groupby(group_col)
           .map_groups(pack, batch_format="pandas")
           .map_batches(lambda b: b, batch_format="pyarrow"))
    return out.sort([group_col, id_col])


def dsir_weights(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
                 target_col: str = "lang", target_value: str = "en",
                 n_buckets: int = 1024):
    """DSIR importance log-weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score every
    raw document by ``log p_target(d) − log p_raw(d)`` under hashed
    bag-of-n-gram models, the weight used to resample a web crawl toward a
    target domain.  Here the target slice is ``target_col == target_value``
    (the reference's Amharic-channel filter generalized to any metadata
    predicate).

    Features are unigrams AND bigrams of the whitespace tokens, hashed into
    ``n_buckets`` with the engine-standard md5-u64 (`sketch._h64` ==
    DuckDB ``md5_number_lower`` — the per-feature md5 is the price of an
    exactly SQL-replicable oracle; a production run would swap in a seeded
    xxhash).  ONE combiner pass emits ≤B (bucket, n_raw, n_tgt) partial
    rows per block (native Sums merge them), so both distributions are
    B-sized no matter the corpus; the Laplace-smoothed log-ratio table
    broadcasts ONCE via ``ray.put`` and the scoring pass is one np.take +
    per-doc segmented sum per batch.  Two column-pruned streaming scans
    total, nothing materialized.

    Output: (doc_id, n_feats, dsir_logweight) — positive = looks like the
    target slice.
    """
    import ray
    from ray.data.aggregate import Sum

    from .sketch import _h64

    def _doc_feature_buckets(b: pa.Table):
        """(bucket ids, doc index per feature) for the batch, unigrams +
        within-doc bigrams."""
        flat, n = _ws_tokens(b[text_col])
        doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
        toks = flat.to_pylist()
        feats = list(toks)
        fdoc = [doc_of]
        if len(toks) >= 2:
            same = doc_of[:-1] == doc_of[1:]
            bi = [f"{toks[i]} {toks[i + 1]}"
                  for i in np.nonzero(same)[0]]
            feats.extend(bi)
            fdoc.append(doc_of[:-1][same])
        buckets = np.fromiter((_h64(f) % n_buckets for f in feats),
                              dtype=np.int64, count=len(feats))
        return buckets, np.concatenate(fdoc) if len(fdoc) > 1 else fdoc[0]

    def count_partials(b: pa.Table) -> pa.Table:
        buckets, fdoc = _doc_feature_buckets(b)
        is_tgt = pc.equal(b[target_col], target_value).to_numpy(
            zero_copy_only=False)
        n_raw = np.bincount(buckets, minlength=n_buckets)
        n_tgt = np.bincount(buckets[is_tgt[fdoc]], minlength=n_buckets)
        nz = np.nonzero(n_raw)[0]
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "n_raw": pa.array(n_raw[nz], pa.int64()),
                         "n_tgt": pa.array(n_tgt[nz], pa.int64())})

    cnt = (docs_ds.select_columns([text_col, target_col])
           .map_batches(count_partials, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("n_raw", alias_name="n_raw"),
                                   Sum("n_tgt", alias_name="n_tgt"))
           .to_pandas())
    raw_total = float(cnt["n_raw"].sum())
    tgt_total = float(cnt["n_tgt"].sum())
    logratio = np.zeros(n_buckets, np.float64)
    bs = cnt["b"].to_numpy(np.int64)
    logratio[bs] = (
        np.log((cnt["n_tgt"].to_numpy(np.float64) + 1.0)
               / (tgt_total + n_buckets))
        - np.log((cnt["n_raw"].to_numpy(np.float64) + 1.0)
                 / (raw_total + n_buckets)))
    lr_ref = ray.put(logratio)

    def score(b: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        buckets, fdoc = _doc_feature_buckets(b)
        w = np.zeros(b.num_rows, np.float64)
        np.add.at(w, fdoc, lr[buckets])
        nf = np.bincount(fdoc, minlength=b.num_rows)
        keep = nf > 0
        return pa.table({
            id_col: b[id_col].filter(pa.array(keep)),
            "n_feats": pa.array(nf[keep], pa.int64()),
            "dsir_logweight": pa.array(np.round(w[keep], 6), pa.float64()),
        })

    return docs_ds.select_columns([id_col, text_col, target_col]) \
        .map_batches(score, batch_format="pyarrow")


def bpe_pair_stats(docs_ds, *, text_col: str = "text", top_n: int = 50):
    """Byte-pair-encoding merge-candidate statistics: corpus-wide counts of
    adjacent CHARACTER pairs within whitespace tokens — the quantity a BPE
    tokenizer trainer (Sennrich et al. 2016) maximizes at every merge
    step; this is iteration 0's full candidate table, the distributed
    heavy-lift of tokenizer training (the merge-apply step is a
    vocabulary-sized driver loop once these counts exist).

    Fully vectorized: each block joins its tokens with NUL separators,
    reads the text as a UTF-32 codepoint array, forms (hi<<32)|lo pair
    codes with a shifted-array AND mask (no pair crosses a token boundary
    because NUL never matches), and bincounts unique codes — no Python
    loop over tokens or characters.  Per-block partials merge with a
    native Sum; the final sort + top-n runs on the pair-vocabulary-sized
    table.  Output: (pair, n) with the deterministic (n desc, pair asc)
    tie-break."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(b[text_col])
        if len(flat) == 0:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        joined = "\x00".join(flat.to_pylist())
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        a, c = cp[:-1], cp[1:]
        mask = (a != 0) & (c != 0)
        codes = (a[mask].astype(np.uint64) << np.uint64(32)) | c[mask]
        uniq, counts = np.unique(codes, return_counts=True)
        pairs = [chr(int(u >> np.uint64(32))) + chr(int(u & np.uint64(0xFFFFFFFF)))
                 for u in uniq]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    merged = (docs_ds.select_columns([text_col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby("pair").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    return (merged.sort_values(["n", "pair"], ascending=[False, True])
            .head(top_n).reset_index(drop=True))


_BPE_SEP = "\x1f"


def _adjacent_pair_partials(b: pa.Table) -> pa.Table:
    """Per-batch (lhs, rhs, score) partials: every adjacent symbol pair of
    every vocab word, weighted by word frequency — vectorized (one
    split_pattern + offsets gather, Arrow group_by combiner)."""
    lists = pc.split_pattern(b["sym"], pattern=_BPE_SEP)
    lists = lists.combine_chunks() if isinstance(
        lists, pa.ChunkedArray) else lists
    flat = lists.flatten()
    n = np.diff(np.asarray(lists.offsets, dtype=np.int64))
    freq = b["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(n)])[:-1]
    npairs = np.maximum(n - 1, 0)
    total = int(npairs.sum())
    if total == 0:
        return pa.table({"lhs": pa.array([], pa.string()),
                         "rhs": pa.array([], pa.string()),
                         "score": pa.array([], pa.int64())})
    widx = np.repeat(np.arange(len(n), dtype=np.int64), npairs)
    poff = np.concatenate([[0], np.cumsum(npairs)])[:-1]
    left = np.arange(total, dtype=np.int64) - poff[widx] + starts[widx]
    t = pa.table({
        "lhs": pc.take(flat, pa.array(left, pa.int64())),
        "rhs": pc.take(flat, pa.array(left + 1, pa.int64())),
        "score": pa.array(freq[widx], pa.int64()),
    })
    return (t.group_by(["lhs", "rhs"]).aggregate([("score", "sum")])
            .rename_columns(["lhs", "rhs", "score"]))


def bpe_train(docs_ds, *, text_col: str = "text", n_merges: int = 5):
    """FULL iterative BPE tokenizer training (Sennrich et al. 2016) — the
    loop bpe_pair_stats is iteration 0 of: repeat ``n_merges`` times
    {count adjacent symbol pairs over the word vocabulary, weighted by
    word frequency → merge the argmax pair (score desc, lhs asc, rhs asc)
    everywhere, left-to-right non-overlapping}.

    Scale shape: the corpus is scanned ONCE to build the word-frequency
    vocabulary (per-batch group_by combiner → one groupby); every merge
    iteration then runs on the VOCABULARY table only — pair partials are
    vectorized Arrow kernels, the argmax is a native max + equality filter
    (only tied rows reach the driver), and the merge-apply is one
    vectorized ``replace_substring`` pass.  Scores are integer word
    frequencies: exact under any merge order.

    Returns (rank, lhs, rhs, merged, score) — the learned merge list.
    """
    from ray.data.aggregate import Sum

    def word_partials(b: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(b[text_col])
        t = pa.table({"word": flat,
                      "freq": pa.array(np.ones(len(flat), np.int64))})
        return (t.group_by("word").aggregate([("freq", "sum")])
                .rename_columns(["word", "freq"]))

    def to_sym(b: pa.Table) -> pa.Table:
        words = b["word"].to_pylist()
        return pa.table({
            "word": b["word"], "freq": b["freq"],
            "sym": pa.array([_BPE_SEP.join(w) for w in words], pa.string()),
        })

    vocab = (docs_ds.map_batches(word_partials, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("freq", alias_name="freq"))
             .map_batches(to_sym, batch_format="pyarrow")
             .materialize())

    merges = []
    for rank in range(1, n_merges + 1):
        pair_ds = (vocab.map_batches(_adjacent_pair_partials,
                                     batch_format="pyarrow")
                   .groupby(["lhs", "rhs"])
                   .aggregate(Sum("score", alias_name="score")))
        best_score = pair_ds.max("score")
        tied = (pair_ds.filter(expr=f"score == {int(best_score)}")
                .to_pandas().sort_values(["lhs", "rhs"]))
        lhs, rhs = str(tied["lhs"].iloc[0]), str(tied["rhs"].iloc[0])
        merges.append({"rank": rank, "lhs": lhs, "rhs": rhs,
                       "merged": lhs + rhs, "score": int(best_score)})

        pat = _BPE_SEP + lhs + _BPE_SEP + rhs + _BPE_SEP
        rep = _BPE_SEP + lhs + rhs + _BPE_SEP

        def apply_merge(b: pa.Table, _pat=pat, _rep=rep) -> pa.Table:
            wrapped = pc.binary_join_element_wise(
                pa.scalar(_BPE_SEP), b["sym"], pa.scalar(_BPE_SEP), "")
            replaced = pc.replace_substring(wrapped, pattern=_pat,
                                            replacement=_rep)
            return pa.table({
                "word": b["word"], "freq": b["freq"],
                "sym": pc.utf8_trim(replaced, characters=_BPE_SEP),
            })

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()

    out = pd.DataFrame(merges)
    out["rank"] = out["rank"].astype("int64")
    out["score"] = out["score"].astype("int64")
    return out


def bpe_encode(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
               n_merges: int = 5):
    """Tokenize the corpus with a just-trained BPE tokenizer: run
    ``bpe_train`` (one corpus scan + K vocabulary-table merge rounds), then
    ONE more corpus pass applying the learned merges and counting the
    resulting subword tokens per document — the "apply the tokenizer"
    step every training-data pipeline runs after training it.

    Scale shape: the merge list is K rows — broadcast in the task closure.
    Inside each batch the merge chain runs over the batch's DISTINCT words
    (Arrow ``unique`` → K vectorized ``replace_substring`` passes), then
    fans back to word instances via ``index_in``/``take`` and to per-doc
    sums via one ``np.bincount`` — the per-word Python cost is bounded by
    distinct-words-per-batch exactly like bpe_train's symbolizer.  Docs
    with no tokens are dropped (JOIN semantics, mirrors the oracle).

    Returns a streaming Dataset (doc_id, n_ws_tokens, n_subwords) — one
    row per document, never materialized on the driver.
    """
    if n_merges > 0:
        merges = bpe_train(docs_ds, text_col=text_col, n_merges=n_merges)
        chain = [(_BPE_SEP + lhs + _BPE_SEP + rhs + _BPE_SEP,
                  _BPE_SEP + lhs + rhs + _BPE_SEP)
                 for lhs, rhs in zip(merges["lhs"], merges["rhs"])]
    else:  # 0 merges = pure character tokenizer
        chain = []

    def encode(b: pa.Table) -> pa.Table:
        arr = b[text_col]
        arr = arr.combine_chunks() if isinstance(
            arr, pa.ChunkedArray) else arr
        arr = pc.fill_null(arr, "")
        lists = pc.split_pattern_regex(arr, pattern=r"\s+")
        flat = lists.flatten()
        offs = np.asarray(lists.offsets, dtype=np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                           np.diff(offs))[keep]
        words = flat.filter(pa.array(keep))

        uniq = pc.unique(words)
        syms = pa.array([_BPE_SEP.join(w) for w in uniq.to_pylist()],
                        pa.string())
        wrapped = pc.binary_join_element_wise(
            pa.scalar(_BPE_SEP), syms, pa.scalar(_BPE_SEP), "")
        for pat, rep in chain:
            wrapped = pc.replace_substring(wrapped, pattern=pat,
                                           replacement=rep)
        trimmed = pc.utf8_trim(wrapped, characters=_BPE_SEP)
        ntok_u = pc.add(pc.count_substring(trimmed, _BPE_SEP),
                        pa.scalar(1, pa.int32()))
        per_word = pc.take(pc.cast(ntok_u, pa.int64()),
                           pc.index_in(words, value_set=uniq)) \
            .to_numpy(zero_copy_only=False)

        bpe = np.bincount(doc_of, weights=per_word,
                          minlength=b.num_rows).astype(np.int64)
        ws = np.bincount(doc_of, minlength=b.num_rows).astype(np.int64)
        nonempty = ws > 0
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nonempty], pa.int64()),
            "n_ws_tokens": pa.array(ws[nonempty], pa.int64()),
            "n_subwords": pa.array(bpe[nonempty], pa.int64())})

    return docs_ds.map_batches(encode, batch_format="pyarrow")


def _substring_partials(b: pa.Table, *, max_piece_len: int) -> pa.Table:
    """Per-batch (piece, n) partials: every codepoint substring of length
    1..max_piece_len of every vocab word, weighted by word frequency.
    Vectorized as (start, length) grid slices — ``max_word_len ×
    max_piece_len`` Arrow kernel passes over the whole word column, no
    Python loop over words."""
    words = b["word"]
    words = words.combine_chunks() if isinstance(
        words, pa.ChunkedArray) else words
    freq = b["freq"]
    wlen = pc.utf8_length(words)
    max_wlen = pc.max(wlen).as_py() or 0
    pieces, ns = [], []
    for s in range(max_wlen):
        for ln in range(1, max_piece_len + 1):
            keep = pc.greater_equal(wlen, s + ln)
            if not pc.any(keep).as_py():
                continue
            sub = pc.utf8_slice_codeunits(
                words.filter(keep), start=s, stop=s + ln)
            pieces.append(sub)
            ns.append(freq.filter(keep))
    if not pieces:
        return pa.table({"piece": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    t = pa.table({"piece": pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in pieces]),
        "n": pa.concat_arrays([x.combine_chunks() if isinstance(
            x, pa.ChunkedArray) else x for x in ns])})
    return (t.group_by("piece").aggregate([("n", "sum")])
            .rename_columns(["piece", "n"]))


def _word_vocab(docs_ds, text_col: str):
    """One corpus scan → distributed (word, freq) vocabulary Dataset
    (per-batch Arrow group_by combiner, then one vocab-sized groupby)."""
    from ray.data.aggregate import Sum

    def word_partials(b: pa.Table) -> pa.Table:
        flat, _ = _ws_tokens(b[text_col])
        t = pa.table({"word": flat,
                      "freq": pa.array(np.ones(len(flat), np.int64))})
        return (t.group_by("word").aggregate([("freq", "sum")])
                .rename_columns(["word", "freq"]))

    return (docs_ds.map_batches(word_partials, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("freq", alias_name="freq")))


def unigram_seed(docs_ds, *, text_col: str = "text",
                 max_piece_len: int = 4, top_n: int = 200):
    """Seed-vocabulary statistics for unigram-LM (SentencePiece) tokenizer
    training (Kudo 2018): corpus-wide frequency of every within-word
    codepoint substring up to ``max_piece_len`` — the candidate-piece
    table the EM trainer starts from (the analog of ``bpe_pair_stats``
    for the unigram model).

    Scale shape: corpus scanned once for the word vocabulary; substrings
    explode over the VOCABULARY table with vectorized slice kernels and a
    per-batch group_by combiner, so the corpus-sized pass never touches
    Python.  Final sort + limit runs on the piece-vocabulary table only.

    Returns (piece, n) top-n, (n desc, piece asc) tie-break.
    """
    from ray.data.aggregate import Sum

    vocab = _word_vocab(docs_ds, text_col)
    merged = (vocab.map_batches(
        lambda b: _substring_partials(b, max_piece_len=max_piece_len),
        batch_format="pyarrow")
        .groupby("piece").aggregate(Sum("n", alias_name="n")))
    out = (merged.sort(["n", "piece"], descending=[True, False])
           .limit(top_n).to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def unigram_train(docs_ds, *, text_col: str = "text",
                  max_piece_len: int = 4, seed_size: int = 400,
                  vocab_size: int = 150, n_iters: int = 2):
    """Unigram-LM tokenizer training (Kudo 2018, SentencePiece) — the
    full EM loop over the seed vocabulary ``unigram_seed`` computes:

    repeat ``n_iters`` times {
      E-step: Viterbi-segment every vocab word under the current piece
              log-probs, accumulating INTEGER piece counts weighted by
              word frequency (distributed: map_batches over the word
              vocabulary with the piece table broadcast in the closure —
              piece table is seed_size rows, words never leave workers);
      M-step: renormalize piece probabilities from the merged counts and
              prune to ``vocab_size`` pieces (count desc, piece asc),
              always retaining every single-character piece so every
              word stays segmentable;
    }

    Simplifications vs full SentencePiece, chosen for determinism: hard-EM
    (Viterbi counts, not forward-backward expectations) and top-k pruning
    (not loss-ranked) — integer counts make the result exact under any
    block order/partitioning.  Viterbi itself is a Python DP per DISTINCT
    word (vocab-sized, same bounded posture as bpe_train's symbolizer).

    Returns (piece, n, logprob): surviving pieces with final Viterbi
    counts and log-probabilities, (n desc, piece asc).
    """
    import math

    from ray.data.aggregate import Sum

    vocab = _word_vocab(docs_ds, text_col).materialize()

    # seed: top substrings + ALL single-char pieces (segmentability floor)
    seed = (vocab.map_batches(
        lambda b: _substring_partials(b, max_piece_len=max_piece_len),
        batch_format="pyarrow")
        .groupby("piece").aggregate(Sum("n", alias_name="n"))
        .materialize())
    top = (seed.sort(["n", "piece"], descending=[True, False])
           .limit(seed_size).to_pandas())
    chars = (seed.map_batches(
        lambda b: b.filter(pc.equal(pc.utf8_length(b["piece"]), 1)),
        batch_format="pyarrow").to_pandas())
    cur = (pd.concat([top, chars]).drop_duplicates("piece")
           .reset_index(drop=True))

    def viterbi_counts(b: pa.Table, logp: dict, maxlen: int) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        words = b["word"].to_pylist()
        freqs = b["freq"].to_pylist()
        for w, f in zip(words, freqs):
            L = len(w)
            best = [(-math.inf, -1)] * (L + 1)
            best[0] = (0.0, 0)
            for j in range(1, L + 1):
                for i in range(max(0, j - maxlen), j):
                    lp = logp.get(w[i:j])
                    if lp is None or best[i][0] == -math.inf:
                        continue
                    cand = best[i][0] + lp
                    # tie → smaller i = longer final piece
                    if cand > best[j][0]:
                        best[j] = (cand, i)
            j = L
            if best[L][0] == -math.inf:
                continue  # unsegmentable (piece pruned) — skip word
            while j > 0:
                i = best[j][1]
                counts[w[i:j]] += f
                j = i
        if not counts:
            return pa.table({"piece": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"piece": pa.array(list(counts), pa.string()),
                         "cnt": pa.array([int(v) for v in counts.values()],
                                         pa.int64())})

    for it in range(n_iters):
        total = int(cur["n"].sum())
        # zero-count singles (kept only for segmentability) get a floor
        # log-prob strictly below any count-1 piece — deterministic, and
        # keeps the integer counts exact for every used piece.
        floor_lp = math.log(0.5 / total)
        logp = {p: (math.log(n / total) if n > 0 else floor_lp)
                for p, n in zip(cur["piece"], cur["n"])}
        merged = (vocab.map_batches(
            lambda b, _lp=logp: viterbi_counts(b, _lp, max_piece_len),
            batch_format="pyarrow")
            .groupby("piece").aggregate(Sum("cnt", alias_name="n"))
            .to_pandas())  # piece-vocab-sized: ≤ seed_size rows
        merged["n"] = merged["n"].astype("int64")
        merged = merged.sort_values(["n", "piece"],
                                    ascending=[False, True])
        keep = merged.head(vocab_size)
        singles = merged[merged["piece"].str.len() == 1]
        # re-add singles from the PREVIOUS vocabulary that got zero Viterbi
        # count this iteration — dropping them could make a word
        # unsegmentable later and silently vanish its counts.
        prev_singles = cur[cur["piece"].str.len() == 1]["piece"]
        missing = prev_singles[~prev_singles.isin(merged["piece"])]
        zero_rows = pd.DataFrame({"piece": missing.to_numpy(),
                                  "n": 0}).astype({"n": "int64"})
        cur = (pd.concat([keep, singles, zero_rows])
               .drop_duplicates("piece").reset_index(drop=True))

    total = int(cur["n"].sum())
    cur = cur.sort_values(["n", "piece"],
                          ascending=[False, True]).reset_index(drop=True)
    floor_lp = math.log(0.5 / total)
    cur["logprob"] = cur["n"].map(
        lambda n: round(math.log(n / total) if n > 0 else floor_lp, 6))
    return cur
