"""Corpus-statistics operators a 100 TB training-data pipeline needs:
heavy-hitter vocabulary (tokenizer training input) and event sessionization
(behavioral log → session table).

Both follow the combiner-first shuffle shape: per-batch partial aggregation
inside map_batches shrinks the exchange to (distinct keys per block), and the
final merge uses native algebraic aggregates or per-group pandas where the
group is one user's (small) event stream.
"""

from __future__ import annotations

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
                      text_col: str = "text"):
    """Bounded-memory heavy hitters (space-saving / Misra-Gries family,
    Metwally et al. 2005): each batch emits at most ``capacity`` (token,
    count) partials — per-batch tail mass is dropped, so merged counts are
    LOWER BOUNDS and the result is approximate when a batch's distinct-token
    count exceeds ``capacity``.  With ``capacity`` ≥ per-batch vocabulary the
    output is exact (the oracle checks that regime).  This is the shuffle
    bound ``token_topk`` lacks: partial size is O(capacity) per block
    regardless of vocabulary size."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in b[text_col].to_pylist():
            counts.update((t or "").split())
        top = counts.most_common(capacity)
        top.sort()
        return pa.table({
            "token": pa.array([t for t, _ in top], pa.string()),
            "n": pa.array([c for _, c in top], pa.int64()),
        })

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


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
