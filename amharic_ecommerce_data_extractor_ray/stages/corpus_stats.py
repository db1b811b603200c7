"""Corpus-statistics operators a 100 TB training-data pipeline needs:
heavy-hitter vocabulary (tokenizer training input) and event sessionization
(behavioral log → session table).

Both follow the combiner-first shuffle shape: per-batch partial aggregation
inside map_batches shrinks the exchange to (distinct keys per block), and the
final merge uses native algebraic aggregates or per-group pandas where the
group is one user's (small) event stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def token_topk(docs_ds, *, k: int = 100, text_col: str = "text"):
    """Global top-k tokens by frequency (count desc, token asc tie-break) —
    the vocabulary/heavy-hitter pass of tokenizer training.

    Shape: per-batch Counter partials (one row per distinct token per block)
    → native Sum groupby (vocab-sized, ≪ corpus) → sort + limit.  The final
    sort shuffles only the vocabulary table."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in b[text_col].to_pylist():
            counts.update((t or "").split())
        toks = sorted(counts)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([counts[t] for t in toks], pa.int64()),
        })

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def space_saving_topk(docs_ds, *, k: int = 100, capacity: int = 4096,
                      text_col: str = "text", chunk_tokens: int | None = None):
    """TRUE bounded-memory heavy hitters (space-saving, Metwally et al.
    2005, batched-increment variant; merge bounds per Agarwal et al.,
    "Mergeability of summaries", PODS 2012).

    Per-worker memory is O(capacity): the batch's token stream is consumed
    in chunks of ≤ ``chunk_tokens`` (default 4×capacity), each chunk's exact
    counts folded into a ≤ ``capacity``-entry summary; on overflow the
    smallest upper bounds are evicted and the eviction ``floor`` (max evicted
    count) becomes the entry bonus/error of later arrivals — exactly the
    space-saving invariant (tracked n ≥ true count ≥ n − err).

    The distributed merge keeps the bounds: each block's partial rows carry
    the block's floor; a token absent from a block may have appeared up to
    ``floor`` times there, so its merged count/err absorb the floors of the
    blocks that did NOT track it.  Output (token, n, err) sorted by
    (n desc, token asc): ``n`` is an upper bound, ``n − err`` a lower bound,
    and ``err`` = 0 ⇒ the count is exact.  With capacity ≥ per-block
    vocabulary every floor is 0 and the result equals ``token_topk`` with an
    all-zero err column (the oracle checks that regime).  (ADVICE r2: the r2
    version was per-block top-k truncation with unbounded per-batch memory
    and no error tracking — this is the real algorithm.)"""
    from collections import Counter

    from ray.data.aggregate import Sum

    chunk = chunk_tokens or capacity * 4

    def partials(b: pa.Table) -> pa.Table:
        summary: dict[str, list] = {}      # token -> [count_ub, err]
        floor = 0
        buf: Counter = Counter()
        buf_n = 0

        def flush():
            nonlocal floor, buf, buf_n
            for t, c in buf.items():
                e = summary.get(t)
                if e is not None:
                    e[0] += c
                else:
                    summary[t] = [c + floor, floor]
            if len(summary) > capacity:
                items = sorted(summary.items(),
                               key=lambda kv: (kv[1][0], kv[0]))
                for t, (c, _e) in items[:len(summary) - capacity]:
                    del summary[t]
                    if c > floor:
                        floor = c
            buf = Counter()
            buf_n = 0

        for t in b[text_col].to_pylist():
            toks = (t or "").split()
            buf.update(toks)
            buf_n += len(toks)
            if buf_n >= chunk:
                flush()
        flush()
        toks = sorted(summary)
        # sentinel row token='' (unreachable via split) carries the block
        # floor so the merge can total it; floor_p on real rows marks which
        # blocks tracked the token
        return pa.table({
            "token": pa.array(toks + [""], pa.string()),
            "cnt": pa.array([summary[t][0] for t in toks] + [0], pa.int64()),
            "err": pa.array([summary[t][1] for t in toks] + [0], pa.int64()),
            "floor_p": pa.array([floor] * (len(toks) + 1), pa.int64()),
        })

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Sum("err", alias_name="err"),
                      Sum("floor_p", alias_name="floor_p"))
           .materialize())

    import pyarrow.compute as pc

    sent = (agg.map_batches(
        lambda b: b.filter(pc.equal(b["token"], "")), batch_format="pyarrow")
        .to_pandas())
    total_floor = int(sent["floor_p"].iloc[0]) if len(sent) else 0

    def finalize(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["token"], ""))
        miss = pc.subtract(pa.scalar(total_floor, pa.int64()), b["floor_p"])
        return pa.table({
            "token": b["token"],
            "n": pc.add(b["cnt"], miss),
            "err": pc.add(b["err"], miss),
        })

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort(["n", "token"], descending=[True, False]).limit(k))


def hash_sample(ds, *, key_col: str, rate_pct: int = 10):
    """Deterministic sampling: keep rows where a stable hash of the key
    lands under ``rate_pct`` % — reproducible across runs and cluster sizes,
    shard-stable (the property seeded RNG sampling lacks at scale), and a
    pure filter (no shuffle).  Hash = DuckDB ``md5_number_lower`` so the
    oracle recomputes membership exactly."""
    from .dedup import _stable_u64

    def keep(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        mask = [_stable_u64(str(k)) % 100 < rate_pct for k in keys]
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def tfidf_topk(docs_ds, *, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3):
    """Per-document top-k TF-IDF terms — the relevance/feature-extraction
    pass of a corpus pipeline.

    Two streaming passes: (1) document frequencies via per-batch distinct
    combiner → native Sum groupby (vocab-sized) + a total-docs Count;
    (2) per-doc TF × broadcast IDF → per-doc top-k, no second shuffle.
    IDF = ln(N / df) (natural log, no smoothing — matches the SQL oracle).
    Output: (doc_id, term, score) with score rounded to 6, ties broken by
    term asc."""
    import math

    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def df_partials(b: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in b[text_col].to_pylist():
            counts.update(set((t or "").split()))
        toks = sorted(counts)
        return pa.table({
            "term": pa.array(toks, pa.string()),
            "df": pa.array([counts[t] for t in toks], pa.int64()),
        })

    n_docs = docs_ds.count()
    df_tab = (docs_ds.map_batches(df_partials, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("df", alias_name="df"))
              .to_pandas())
    # vocab is ≪ corpus; broadcast the idf lookup once
    idf = {t: math.log(n_docs / d) for t, d in zip(df_tab["term"],
                                                   df_tab["df"])}
    idf_ref = ray.put(idf)

    def score(b: pa.Table) -> pa.Table:
        import ray as _ray

        lookup = _ray.get(idf_ref)
        out_id, out_term, out_score = [], [], []
        for did, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            toks = (t or "").split()
            if not toks:
                continue
            from collections import Counter

            tf = Counter(toks)
            n = len(toks)
            scored = sorted(
                ((-(c / n) * lookup[term], term) for term, c in tf.items()))
            for neg, term in scored[:k]:
                out_id.append(did)
                out_term.append(term)
                out_score.append(round(-neg, 6))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "score": pa.array(out_score, pa.float64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def sessionize(events_ds, *, gap_minutes: int = 30):
    """Events → per-user sessions: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``.

    Partitioning: groupby(user_id) co-locates each user's stream; the
    per-group function sorts one user's events (small) and splits on gaps.
    Output: (user_id, session_idx, session_start, session_end, n_events,
    sum_value), timestamps as strings for oracle comparison."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        new_session = (g["ts"].diff() > gap).cumsum()
        out = (g.groupby(new_session)
               .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                    n_events=("ts", "size"), sum_value=("value", "sum"))
               .reset_index(drop=True))
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out.insert(1, "session_idx", range(len(out)))
        out["session_start"] = out["session_start"].dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        out["session_end"] = out["session_end"].dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        out["sum_value"] = out["sum_value"].round(6)
        out["n_events"] = out["n_events"].astype("int64")
        out["session_idx"] = out["session_idx"].astype("int64")
        return out

    return (events_ds.groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))


def stratified_sample(ds, *, stratum_col: str, key_col: str,
                      rates_pct: dict[str, int], default_pct: int = 0):
    """Per-stratum deterministic sampling — the corpus-balancing primitive
    (e.g. keep 100% of a rare language, 5% of the dominant one).

    Same shard-stable membership rule as ``hash_sample`` (DuckDB
    ``md5_number_lower`` of the key mod 100), but the threshold comes from a
    per-stratum rate map shipped once in the task closure (vocabulary-sized,
    never shuffled).  A pure filter: no shuffle, composes with any
    downstream stage, reproducible across runs, shards, and cluster sizes.
    Strata absent from the map fall back to ``default_pct``."""
    from .dedup import _stable_u64

    def keep(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        strata = b[stratum_col].to_pylist()
        mask = [_stable_u64(str(k)) % 100 < rates_pct.get(s, default_pct)
                for k, s in zip(keys, strata)]
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def per_group_capped_sample(ds, *, group_col: str, key_col: str, k: int):
    """Fixed-SIZE per-stratum sample: the K rows of each group with the
    smallest stable key hash — the cap-based complement of
    ``stratified_sample``'s rate-based thinning (e.g. "at most K docs per
    language for the eval slice"), deterministic and shard-stable.

    Mergeable top-k by rank: each block prunes to ≤ K rows per group
    locally (so the shuffle carries ≤ K × groups × blocks tiny rows, never
    raw data), then one groupby re-prunes to the global K.  Hash = DuckDB
    ``md5_number_lower`` (unsigned order), so the oracle recomputes the
    selection with a PARTITION BY row_number."""
    import numpy as np

    from .dedup import _stable_u64

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, key_col]).to_pandas()
        df["h"] = np.array([_stable_u64(str(x)) for x in df[key_col]],
                           dtype=np.uint64)
        pruned = (df.sort_values(["h", key_col])
                  .groupby(group_col, sort=False).head(k))
        return pa.Table.from_pandas(pruned, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["h", key_col]).head(k)
                .drop(columns=["h"])[[group_col, key_col]])

    return (ds.select_columns([group_col, key_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(final, batch_format="pandas"))


def trending_tokens(corpus_ds, *, k: int = 3, date_col: str = "message_date",
                    text_col: str = "content"):
    """Windowed heavy hitters: top-k tokens per calendar day (the "what's
    trending" pass over a message stream).

    ONE shuffle: per-batch (date, token, n) Counter partials collapse each
    block to its local date×token vocabulary, then a single
    ``groupby(date)`` co-locates a day's partials and the per-day fold
    (sum + top-k) runs inside ``map_groups`` — group payload is bounded by
    vocabulary × blocks, never raw messages.  Dates serialize as ISO
    strings so the SQL oracle compares exactly."""
    from collections import Counter

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for d, t in zip(b[date_col].to_pylist(), b[text_col].to_pylist()):
            ds_ = str(d)
            for tok in (t or "").split():
                c[(ds_, tok)] += 1
        ks = sorted(c)
        return pa.table({
            date_col: pa.array([d for d, _ in ks], pa.string()),
            "token": pa.array([t for _, t in ks], pa.string()),
            "n": pa.array([c[x] for x in ks], pa.int64()),
        })

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("token", as_index=False)["n"].sum()
               .sort_values(["n", "token"], ascending=[False, True])
               .head(k))
        agg.insert(0, date_col, g[date_col].iloc[0])
        return agg

    return (corpus_ds.select_columns([date_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(date_col).map_groups(topk, batch_format="pandas"))


def inverted_index(docs_ds, *, id_col: str = "doc_id",
                   text_col: str = "text", max_postings: int = 20):
    """Inverted index build (token → document-frequency + capped posting
    list) — the retrieval-side artifact of a corpus pipeline.

    Shape: per-batch DISTINCT (token, doc_id) via Arrow hash ``group_by``
    (the combiner: a token repeated in a doc contributes one row), ONE
    groupby(token) co-locates each posting list, and the per-group merge
    emits ``df`` (exact, from the pre-deduped rows) plus the first
    ``max_postings`` doc ids ascending as a comma string.  Capping bounds
    the output row; a full-posting-list variant would write the exploded
    (token, doc_id) table as token-partitioned Parquet instead of strings
    (same shuffle, no per-row giant value)."""
    import numpy as np

    def pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # one vectorized explode (same \s+ split the SQL oracle uses), no
        # per-row Python: doc ids repeat by list length, empties filtered,
        # per-doc DISTINCT via Arrow hash group_by
        tl = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                    pattern=r"\s+")
        n_tok = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), n_tok)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        keep = pc.not_equal(flat, "")
        t = pa.table({
            "token": flat.filter(keep),
            id_col: pa.array(ids[keep.to_numpy(zero_copy_only=False)],
                             pa.int64()),
        })
        return pa.TableGroupBy(t, ["token", id_col]).aggregate([]) \
            .rename_columns(["token", id_col])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy(np.int64))
        return pd.DataFrame([{
            "token": g["token"].iloc[0],
            "df": len(ids),
            "postings": ",".join(map(str, ids[:max_postings])),
        }])

    return (docs_ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("token").map_groups(merge, batch_format="pandas"))


def token_pmi(docs_ds, *, text_col: str = "text", min_support: int = 5,
              k: int = 50):
    """Pointwise-mutual-information token co-occurrence (collocation mining,
    Church & Hanks 1990) — top-k token pairs by PMI with a document-count
    support floor.

    Two passes, both combiner-shaped:
      1. document frequencies via one vocab-sized groupby; vocabulary +
         doc count broadcast once via ``ray.put``.
      2. per-batch binary doc×term matrix against the broadcast vocab and a
         single ``Mᵀ·M`` matmul → the block's vocab×vocab co-occurrence
         counts; only the nonzero upper triangle leaves the worker, merged
         by a native Sum groupby.  No per-pair Python loops: the matmul IS
         the pair enumeration, and partials are vocabulary²-bounded (not
         corpus-bounded) — the same trick as embedding-cosine dedup.

    PMI = ln(n_ab·N / (df_a·df_b)) over document-level (not positional)
    co-occurrence; deterministic order (pmi desc, token_a, token_b)."""
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    def df_partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized explode -> per-doc DISTINCT -> per-token df, all in
        # Arrow hash group_by (no Counter loop)
        tl = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                    pattern=r"\s+")
        n_tok = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
        d = np.repeat(np.arange(b.num_rows, dtype=np.int64), n_tok)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        keep = pc.not_equal(flat, "")
        t = pa.table({"token": flat.filter(keep),
                      "d": pa.array(d[keep.to_numpy(zero_copy_only=False)],
                                    pa.int64())})
        dist = pa.TableGroupBy(t, ["token", "d"]).aggregate([])
        return pa.TableGroupBy(dist, "token").aggregate(
            [("d", "count")]).rename_columns(["token", "df"])

    df_tbl = (docs_ds.map_batches(df_partials, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("df", alias_name="df"))
              .to_pandas().sort_values("token").reset_index(drop=True))
    n_docs = docs_ds.count()
    vocab_ref = ray.put(pa.array(df_tbl["token"], pa.string()))

    def cooc_partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized: explode once, map tokens to vocab codes with ONE
        # Arrow index_in, scatter the binary doc x term matrix with fancy
        # indexing (duplicate (doc, code) writes are idempotent 1.0s)
        vocab_arr = ray.get(vocab_ref)
        nv = len(vocab_arr)
        tl = pc.split_pattern_regex(pc.fill_null(b[text_col], ""),
                                    pattern=r"\s+")
        n_tok = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
        d = np.repeat(np.arange(b.num_rows, dtype=np.int64), n_tok)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        codes = pc.index_in(flat, value_set=vocab_arr) \
            .to_numpy(zero_copy_only=False)
        m = np.zeros((b.num_rows, nv), np.float32)
        m[d[keep], codes[keep].astype(np.int64)] = 1.0
        co = m.T @ m                     # vocab×vocab, the pair enumeration
        iu = np.triu_indices(nv, k=1)
        n = co[iu].astype(np.int64)
        nz = n > 0
        return pa.table({"ia": pa.array(iu[0][nz], pa.int64()),
                         "ib": pa.array(iu[1][nz], pa.int64()),
                         "n_ab": pa.array(n[nz], pa.int64())})

    co = (docs_ds.map_batches(cooc_partials, batch_format="pyarrow")
          .groupby(["ia", "ib"]).aggregate(Sum("n_ab", alias_name="n_ab"))
          .to_pandas())
    co = co[co["n_ab"] >= min_support]
    toks = df_tbl["token"].to_numpy()
    dfs = df_tbl["df"].to_numpy(np.float64)
    pmi = np.log(co["n_ab"].to_numpy(np.float64) * float(n_docs)
                 / (dfs[co["ia"]] * dfs[co["ib"]]))
    out = pd.DataFrame({
        "token_a": toks[co["ia"]], "token_b": toks[co["ib"]],
        "n_ab": co["n_ab"].to_numpy(np.int64), "pmi": pmi,
    }).sort_values(["pmi", "token_a", "token_b"],
                   ascending=[False, True, True]).head(k)
    out["pmi"] = out["pmi"].round(6)
    return out.reset_index(drop=True)


def weighted_sample(ds, *, key_col: str, weight_col: str, k: int = 100):
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws a reproducible pseudo-uniform
    ``u`` from the md5 of its key and survives by the top-k of
    ``u^(1/w)`` — heavier rows win proportionally more often, yet the
    draw is shard-stable and re-runnable (no RNG state, no seed drift
    across cluster sizes).

    Scale shape: the score is a pure per-row kernel; each block keeps only
    its local top-k, so the final sort/limit shuffles O(k × blocks) rows —
    the same partial-top-k contract as brute-force ANN."""
    import numpy as np

    from .dedup import _stable_u64

    M = 1 << 32

    def score_topk(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        u = np.fromiter(((_stable_u64(str(kk)) % M + 0.5) / M
                         for kk in keys), np.float64, len(keys))
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        wkey = u ** (1.0 / w)
        order = np.argsort(-wkey)[:k]
        t = b.take(pa.array(np.sort(order)))
        return t.append_column("wkey", pa.array(wkey[np.sort(order)],
                                                pa.float64()))

    top = (ds.map_batches(score_topk, batch_format="pyarrow")
           .sort(["wkey", key_col], descending=[True, False]).limit(k)
           .to_pandas())
    top["wkey"] = top["wkey"].round(6)
    return top


def bigram_lm(docs_ds, *, text_col: str = "text", k_smooth: float = 1.0,
              topn: int = 100):
    """Bigram language model estimation with add-k (Laplace) smoothing —
    the n-gram-LM / next-token-statistics pass of a corpus pipeline:
    P(b|a) = (c(a,b) + k) / (c(a·) + k·V) over within-document adjacent
    token pairs.

    Combiner shape: per-block bigram AND unigram-prefix counts come from
    one vectorized explode (factorized codes, no per-doc loop), each
    merged by a native Sum groupby; V (vocabulary size of bigram prefixes'
    successors = distinct tokens) is the count of the unigram table.  Only
    vocabulary-sized tables shuffle.  Output: top-n bigrams by (count desc,
    pair asc) with the smoothed conditional probability."""
    import numpy as np

    from ray.data.aggregate import Sum

    def pair_partials(b: pa.Table) -> pa.Table:
        tl = pa.compute.split_pattern(b[text_col], pattern=" ")
        counts = pa.compute.list_value_length(tl).to_numpy(
            zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(b)), counts)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        toks = flat.to_pandas().to_numpy()
        if len(toks) < 2:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = doc_idx[:-1] == doc_idx[1:]
        df = pd.DataFrame({"tok_a": toks[:-1][same],
                           "tok_b": toks[1:][same]})
        g = df.groupby(["tok_a", "tok_b"], sort=True).size()
        return pa.table({
            "tok_a": pa.array(g.index.get_level_values(0), pa.string()),
            "tok_b": pa.array(g.index.get_level_values(1), pa.string()),
            "n": pa.array(g.to_numpy(np.int64), pa.int64()),
        })

    bigrams = (docs_ds.map_batches(pair_partials, batch_format="pyarrow")
               .groupby(["tok_a", "tok_b"])
               .aggregate(Sum("n", alias_name="n")))

    def uni_partials(b: pa.Table) -> pa.Table:
        # vectorized: one explode (split(" ") == SQL string_split, keeps
        # empties), prefix = tokens whose successor is in the same doc,
        # both rollups via C-level pandas groupbys — no Counter loop
        tl = pa.compute.split_pattern(b[text_col], pattern=" ")
        counts = pa.compute.list_value_length(tl).to_numpy(
            zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(b)), counts)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        toks = flat.to_pandas().to_numpy()
        if len(toks) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "kind": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = doc_idx[:-1] == doc_idx[1:] if len(toks) > 1 else \
            np.zeros(0, dtype=bool)
        pref = pd.Series(toks[:-1][same]).value_counts()
        vocab = pd.unique(toks)
        return pa.table({
            "tok": pa.array(list(pref.index) + list(vocab), pa.string()),
            "kind": pa.array(["p"] * len(pref) + ["v"] * len(vocab),
                             pa.string()),
            "n": pa.array(list(pref.to_numpy()) + [1] * len(vocab),
                          pa.int64()),
        })

    uni = (docs_ds.map_batches(uni_partials, batch_format="pyarrow")
           .groupby(["tok", "kind"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    prefix_counts = dict(zip(uni.loc[uni["kind"] == "p", "tok"],
                             uni.loc[uni["kind"] == "p", "n"]))
    vocab_size = int((uni["kind"] == "v").sum())

    top = (bigrams.sort(["n", "tok_a", "tok_b"],
                        descending=[True, False, False]).limit(topn)
           .to_pandas())
    ca = top["tok_a"].map(prefix_counts).to_numpy(np.float64)
    p = (top["n"].to_numpy(np.float64) + k_smooth) / \
        (ca + k_smooth * vocab_size)
    top["prob"] = np.floor(p * 1e6 + 0.5) / 1e6
    top["n"] = top["n"].astype("int64")
    return top.reset_index(drop=True)


def source_mixture_weights(docs_ds, *, source_col: str = "source",
                           text_col: str = "text"):
    """Domain-mixture reweighting (DoReMi-lite static variant): per-source
    token/document counts and the sampling weight that equalizes the token
    budget across sources (weight_s = uniform_share / actual_share).  The
    table a mixture-aware sampler multiplies into per-doc sampling
    probabilities when composing a training set from skewed sources.

    Shape: one scan, per-batch (source → Σtokens, Σdocs) Arrow group_by
    combiner, one vocabulary-sized groupby; integer counts so shares and
    weights are bit-deterministic."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        from ..stages.seqprep import _ws_tokens
        _, n = _ws_tokens(b[text_col])
        t = pa.table({
            source_col: b[source_col],
            "n_tokens": pa.array(n, pa.int64()),
            "n_docs": pa.array(np.ones(len(n), np.int64)),
        })
        return (t.group_by(source_col)
                .aggregate([("n_tokens", "sum"), ("n_docs", "sum")])
                .rename_columns([source_col, "n_tokens", "n_docs"]))

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby(source_col)
           .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                      Sum("n_docs", alias_name="n_docs"))
           .to_pandas())
    total = float(agg["n_tokens"].sum())
    n_sources = len(agg)
    share = agg["n_tokens"].astype("float64") / total
    weight = (1.0 / n_sources) / share

    def r6(x):
        return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6

    out = agg[[source_col]].copy()
    out["n_docs"] = agg["n_docs"].astype("int64")
    out["n_tokens"] = agg["n_tokens"].astype("int64")
    out["token_share"] = r6(share)
    out["weight"] = r6(weight)
    return out.sort_values(source_col).reset_index(drop=True)


def zipf_fit(docs_ds, *, k: int = 1000, text_col: str = "text"):
    """Zipf-law fit over the top-``k`` token frequencies — the corpus-health
    summary (natural text ≈ slope −1; templated/spammy corpora deviate):
    least-squares slope/intercept of ln(freq) vs ln(rank).

    Shape: reuses the ``token_topk`` heavy-hitter pass (vocab-sized
    combiner groupby + top-k sort); the regression folds the tiny k-row
    table driver-side with the same closed-form moments as
    ``relational.daily_trend``, mirrored by DuckDB ``regr_*`` over the
    identical rank window.  Output: one row
    (n_types_topk, n_tokens_topk, zipf_slope, zipf_intercept)."""
    import numpy as np
    import pandas as pd

    top = token_topk(docs_ds, k=k, text_col=text_col).to_pandas()
    top = top.sort_values(["n", "token"],
                          ascending=[False, True]).reset_index(drop=True)
    rank = np.arange(1, len(top) + 1, dtype=np.float64)
    x = np.log(rank)
    y = np.log(top["n"].to_numpy(dtype=np.float64))
    n = float(len(x))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    den = n * sxx - sx * sx
    if den == 0.0:  # <2 distinct ranks → regr_slope is NULL (ADVICE r3)
        slope, intercept = float("nan"), float("nan")
    else:
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
    r6 = lambda v: float(np.floor(v * 1e6 + 0.5) / 1e6)  # noqa: E731
    return pd.DataFrame({
        "n_types_topk": pd.array([len(top)], dtype="int64"),
        "n_tokens_topk": pd.array([int(top["n"].sum())], dtype="int64"),
        "zipf_slope": [r6(slope)],
        "zipf_intercept": [r6(intercept)],
    })


def bm25_topk(docs_ds, query_terms: list[str], k: int = 20, *,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75):
    """BM25 document ranking for one bag-of-terms query (Robertson/
    Sparck-Jones with the Lucene ``+1`` idf floor) — the retrieval-side
    scorer next to ``tfidf_topk``/``inverted_index``:

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len(d)/avgdl))``,
    ``idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)``.

    Shape: pass 1 is ONE combiner scan emitting per-batch df partials for
    the (broadcast, tiny) query-term set plus a sentinel row carrying
    (n_docs, Σlen) — the shuffle is O(|Q| × blocks), never vocab-sized;
    the driver folds idf/avgdl.  Pass 2 scores each batch with the idf
    table broadcast via ``ray.put`` — tf from ONE vectorized explode +
    bincount (no per-row Python), per-batch partial top-k, driver merges
    O(k × blocks) rows.  Ranking uses the 6-dp-rounded score (ties then
    doc_id asc) so float sum order cannot flip ranks vs the oracle.

    Output: (doc_id, bm25), k rows, (bm25 desc, doc_id asc)."""
    import math

    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    terms = sorted(set(query_terms))
    T = len(terms)
    tset = pa.array(terms, pa.string())

    def explode(bt: pa.Table):
        """(row_index, token) pairs for non-empty whitespace tokens."""
        import pyarrow.compute as pc

        tl = pc.split_pattern_regex(pc.fill_null(bt[text_col], ""),
                                    pattern=r"\s+")
        n_tok = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(bt.num_rows, dtype=np.int64), n_tok)
        flat = tl.combine_chunks().flatten() if isinstance(
            tl, pa.ChunkedArray) else tl.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return rows[keep], flat.filter(pa.array(keep))

    def stats_partials(bt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rows, toks = explode(bt)
        lens_sum = int(len(rows))
        ti = pc.fill_null(pc.index_in(toks, value_set=tset), -1) \
            .to_numpy(zero_copy_only=False)
        hit = ti >= 0
        # df partial: DISTINCT (row, term) pairs per batch
        pairs = np.unique(rows[hit] * T + ti[hit])
        dfp = np.bincount((pairs % T).astype(np.int64), minlength=T)
        out_terms = [terms[i] for i in range(T)] + [""]
        return pa.table({
            "term": pa.array(out_terms, pa.string()),
            "df": pa.array(list(dfp) + [0], pa.int64()),
            "n_docs": pa.array([0] * T + [bt.num_rows], pa.int64()),
            "sum_len": pa.array([0] * T + [lens_sum], pa.int64()),
        })

    merged = (docs_ds.map_batches(stats_partials, batch_format="pyarrow")
              .groupby("term")
              .aggregate(Sum("df", alias_name="df"),
                         Sum("n_docs", alias_name="n_docs"),
                         Sum("sum_len", alias_name="sum_len"))
              .to_pandas())                      # ≤ |Q| + 1 rows
    sent = merged[merged["term"] == ""]
    n_docs = int(sent["n_docs"].iloc[0]) if len(sent) else 0
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                             "bm25": pd.array([], dtype="float64")})
    avgdl = int(sent["sum_len"].iloc[0]) / n_docs
    dfs = dict(zip(merged["term"], merged["df"]))
    idf = np.array([math.log((n_docs - dfs.get(t, 0) + 0.5)
                             / (dfs.get(t, 0) + 0.5) + 1) for t in terms])
    ref = ray.put((idf, avgdl))

    def score_partials(bt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idf_v, avg = ray.get(ref)
        rows, toks = explode(bt)
        lens = np.bincount(rows, minlength=bt.num_rows).astype(np.float64)
        ti = pc.fill_null(pc.index_in(toks, value_set=tset), -1) \
            .to_numpy(zero_copy_only=False)
        hit = ti >= 0
        if not hit.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bm25": pa.array([], pa.float64())})
        tf = np.bincount(rows[hit] * T + ti[hit],
                         minlength=bt.num_rows * T) \
            .reshape(bt.num_rows, T).astype(np.float64)
        denom = tf + k1 * (1 - b + b * lens[:, None] / avg)
        sc = (tf * (k1 + 1) / denom * idf_v[None, :]).sum(axis=1)
        mask = tf.sum(axis=1) > 0
        ids = bt[id_col].to_numpy(zero_copy_only=False)[mask]
        sc6 = np.floor(sc[mask] * 1e6 + 0.5) / 1e6
        order = np.lexsort((ids, -sc6))[:min(k, len(ids))]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "bm25": pa.array(sc6[order], pa.float64())})

    parts = (docs_ds.map_batches(score_partials, batch_format="pyarrow")
             .to_pandas())                       # ≤ k × n_blocks rows
    return (parts.sort_values(["bm25", id_col], ascending=[False, True])
            .head(k).reset_index(drop=True))
