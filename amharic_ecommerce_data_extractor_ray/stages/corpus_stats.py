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
