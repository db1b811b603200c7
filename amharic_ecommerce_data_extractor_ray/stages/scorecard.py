"""Vendor scorecard (G1-G4, O1) — notebook-03 semantics, shuffle-light.

Instead of shuffling every message row into a ``groupby('repo')``, each input
batch is pre-aggregated to ONE partial row per vendor per batch (the
algebraic combiner pattern, SURVEY.md §4 / ray_guide "Aggregation at scale").
The shuffle then moves ≤ n_vendors × n_batches tiny rows, so a mega-vendor
owning 30% of all messages contributes no more shuffle volume than anyone
else — this is the skew answer (salting is unnecessary because every carried
statistic, including the per-group argmax, is algebraically mergeable).

Semantics (canonical spec = reference notebook 03 cells 13/18/21; the
src/analytics module is broken, SURVEY.md §2.4):
- date_range_days = (max_date - min_date).days + 1; if ≤ 0 → posts_per_week =
  total_posts and range := 1, else posts_per_week = n / (range / 7)
- avg_price = mean over all flattened numerical prices, NaN→0 before scoring
- top post per vendor = argmax(views), tie broken by LOWEST message_id (the
  engine pins the reference's first-occurrence idxmax to a deterministic rule)
- lending_score = 100 × (0.4·mm(avg_views) + 0.4·mm(posts_week) +
  0.2·mm(avg_price)), mm = min-max over vendors, 0 when max == min
- final ordering: score desc, vendor asc
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

METRIC_WEIGHTS = {
    "avg_views_per_post": 0.4,
    "posts_per_week": 0.4,
    "avg_price_etb": 0.2,
}

_PARTIAL_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("n_posts", pa.int64()),
    ("sum_views", pa.int64()),
    ("min_date", pa.date32()),
    ("max_date", pa.date32()),
    ("sum_price", pa.float64()),
    ("n_price", pa.int64()),
    ("best_views", pa.int64()),
    ("best_mid", pa.int64()),
    ("best_product", pa.string()),
    ("best_price", pa.float64()),
])


def _list_first_and_sums(arr) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """list<T> column → (first element or null per row, per-row sum,
    per-row count).  Pure Arrow/numpy: offsets arithmetic, no row loop.
    Physical offsets index into ``arr.values`` even for sliced arrays."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = arr.offsets.to_numpy().astype(np.int64)
    lengths = offs[1:] - offs[:-1]
    valid = lengths > 0
    first = arr.values.take(pa.array(offs[:-1], mask=~valid))
    if pa.types.is_floating(arr.type.value_type):
        vals = np.asarray(arr.values)
        csum = np.concatenate([[0.0], np.cumsum(vals)])
        row_sums = csum[offs[1:]] - csum[offs[:-1]]
    else:
        row_sums = np.zeros(len(lengths))
    return first, row_sums, lengths


def _partials_from_columns(t: pa.Table) -> pa.Table:
    """Core partial-aggregate: a row-level table with columns (repo, views,
    message_date, message_id, row_sum_price, row_n_price, first_product,
    first_price) → one partial row per vendor, via Arrow C++ hash
    ``group_by`` plus a sort-based argmax — the same per-row-dict-loop →
    Arrow transformation that bought 32× in canonicalize (commit f254ea2)."""
    if t.num_rows == 0:
        return _PARTIAL_SCHEMA.empty_table()
    grouped = pa.TableGroupBy(t, "repo", use_threads=False).aggregate([
        ("views", "count", pc.CountOptions(mode="all")), ("views", "sum"),
        ("message_date", "min"), ("message_date", "max"),
        ("row_sum_price", "sum"), ("row_n_price", "sum"),
    ]).sort_by("repo")
    # argmax by (views desc, message_id asc): lexicographic sort, then the
    # first row of each contiguous repo run is that vendor's best post.
    order = pc.sort_indices(t, sort_keys=[
        ("repo", "ascending"), ("views", "descending"),
        ("message_id", "ascending")]).to_numpy()
    codes_arr = pc.dictionary_encode(t["repo"])
    if isinstance(codes_arr, pa.ChunkedArray):
        codes_arr = codes_arr.combine_chunks()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False)
    _, first_pos = np.unique(codes[order], return_index=True)
    best = (t.select(["repo", "views", "message_id",
                      "first_product", "first_price"])
            .take(pa.array(order[first_pos]))
            .sort_by("repo"))
    return pa.table({
        "repo": grouped["repo"],
        "n_posts": grouped["views_count"],
        "sum_views": grouped["views_sum"],
        "min_date": grouped["message_date_min"],
        "max_date": grouped["message_date_max"],
        "sum_price": grouped["row_sum_price_sum"],
        "n_price": grouped["row_n_price_sum"],
        "best_views": best["views"],
        "best_mid": best["message_id"],
        "best_product": best["first_product"],
        "best_price": best["first_price"],
    }, schema=_PARTIAL_SCHEMA)


def scorecard_partials_batch(batch: pa.Table) -> pa.Table:
    """One partial-aggregate row per vendor per batch (exact, mergeable).

    Vectorized: list-column firsts/sums from offset arithmetic, everything
    else Arrow hash group_by (differential-tested against the retired row
    loop in tests/test_scorecard.py)."""
    first_prod, _, _ = _list_first_and_sums(batch["products"])
    first_price, row_sums, row_counts = _list_first_and_sums(
        batch["all_numerical_prices"])
    t = pa.table({
        "repo": batch["repo"],
        "views": batch["views"],
        "message_date": batch["message_date"],
        "message_id": batch["message_id"],
        "row_sum_price": pa.array(row_sums, pa.float64()),
        "row_n_price": pa.array(row_counts.astype(np.int64), pa.int64()),
        "first_product": first_prod,
        "first_price": first_price,
    })
    return _partials_from_columns(t)


def fused_scorecard_partials_batch(batch: pa.Table) -> pa.Table:
    """content → tag → entities → per-vendor partials in ONE kernel, with no
    intermediate entity list columns (same fusion rationale as
    enrich.fused_triples_batch: the avoided Arrow list-column allocation is
    what scales).  Output ≡ ``fused_entities_batch → scorecard_partials_batch``
    (differential test in tests/test_scorecard.py).

    The unavoidable Python part — the rule tagger — emits flat per-row scalars
    (first product / first price / per-row price sum+count); all aggregation
    then runs through the shared Arrow hash-group_by partial kernel."""
    from ..functions.prices import extract_numerical_price, is_nan
    from ..functions.tagger import decode_entities
    from ..stages.enrich import _tag_rows

    n = batch.num_rows
    tagged = _tag_rows(batch["content"].to_pylist())

    first_prod: list[str | None] = [None] * n
    first_price: list[float | None] = [None] * n
    row_sum = np.zeros(n)
    row_n = np.zeros(n, np.int64)
    for i, pairs in enumerate(tagged):
        for etype, surface in decode_entities(pairs):
            if etype == "PRODUCT":
                if first_prod[i] is None:
                    first_prod[i] = surface
            elif etype == "PRICE":
                val = extract_numerical_price([surface])
                if not is_nan(val):
                    if first_price[i] is None:
                        first_price[i] = val
                    row_sum[i] += val
                    row_n[i] += 1

    t = pa.table({
        "repo": batch["repo"],
        "views": batch["views"],
        "message_date": batch["message_date"],
        "message_id": batch["message_id"],
        "row_sum_price": pa.array(row_sum, pa.float64()),
        "row_n_price": pa.array(row_n, pa.int64()),
        "first_product": pa.array(first_prod, pa.string()),
        "first_price": pa.array(first_price, pa.float64()),
    })
    return _partials_from_columns(t)


def merge_partials_group(g: pd.DataFrame) -> pd.DataFrame:
    """Merge the per-batch partials of one vendor into one row."""
    best = g.sort_values(["best_views", "best_mid"],
                         ascending=[False, True]).iloc[0]
    return pd.DataFrame([{
        "repo": g["repo"].iloc[0],
        "n_posts": int(g["n_posts"].sum()),
        "sum_views": int(g["sum_views"].sum()),
        "min_date": g["min_date"].min(),
        "max_date": g["max_date"].max(),
        "sum_price": float(g["sum_price"].sum()),
        "n_price": int(g["n_price"].sum()),
        "best_views": int(best["best_views"]),
        "best_mid": int(best["best_mid"]),
        "best_product": best["best_product"],
        "best_price": best["best_price"],
    }])


def finalize_scorecard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Merged per-vendor rows → final scorecard (driver-side; one row per
    vendor, tiny).  Implements nb-03 cells 13/18/21 exactly."""
    rows = []
    for _, r in pdf.iterrows():
        n = int(r["n_posts"])
        avg_views = r["sum_views"] / n
        mind, maxd = r["min_date"], r["max_date"]
        if isinstance(mind, pd.Timestamp):
            mind, maxd = mind.date(), maxd.date()
        range_days = (maxd - mind).days + 1 if isinstance(mind, dt.date) else 0
        if range_days <= 0:
            ppw = float(n)
            range_days = 1
        else:
            ppw = n / (range_days / 7)
        avg_price = (r["sum_price"] / r["n_price"]) if r["n_price"] > 0 else np.nan
        rows.append({
            "vendor": r["repo"],
            "total_posts": n,
            "avg_views_per_post": avg_views,
            "posts_per_week": ppw,
            "avg_price_etb": avg_price,
            "top_product": r["best_product"] if r["best_product"] is not None else "N/A",
            "top_product_price": r["best_price"],
            "date_range_days": range_days,
        })
    out = pd.DataFrame(rows)
    # NaN→0 on the weighted metrics BEFORE min-max (nb cell 18 mutates the
    # scorecard columns in place, so avg_price_etb displays as 0 too)
    for col in METRIC_WEIGHTS:
        out[col] = out[col].fillna(0.0)
    score = np.zeros(len(out))
    for col, w in METRIC_WEIGHTS.items():
        lo, hi = out[col].min(), out[col].max()
        norm = np.zeros(len(out)) if hi == lo else (out[col] - lo) / (hi - lo)
        score = score + norm * w
    out["lending_score"] = score / sum(METRIC_WEIGHTS.values()) * 100.0
    out = out.sort_values(["lending_score", "vendor"],
                          ascending=[False, True]).reset_index(drop=True)
    return out


def scorecard_from_messages(messages_ds) -> pd.DataFrame:
    """Full scorecard over a message-level Dataset that already carries
    ``products`` and ``all_numerical_prices`` (see stages.enrich).  Streaming:
    partials per batch → tiny shuffle → driver finalize.

    The partials are ``materialize()``d before the groupby: they are tiny
    (≤ n_vendors rows per input block, a few KB each), and ending the heavy
    map pipeline there lets the streaming executor give it every CPU slot —
    with the shuffle in the same plan, Ray's operator resource reservation
    holds back ~half the slots for the downstream AllToAll and the map stage
    runs at ≈40% utilization (measured 104 s → 46 s at 8 CPUs).  At cluster
    scale the materialized partials stay in the object store (never the
    driver), so this is safe for millions of vendors."""
    partials = messages_ds.map_batches(scorecard_partials_batch,
                                       batch_format="pyarrow").materialize()
    merged = partials.groupby("repo").map_groups(merge_partials_group,
                                                 batch_format="pandas")
    return finalize_scorecard(merged.to_pandas())


SCORECARD_INPUT_COLS = ["message_id", "repo", "content", "views",
                        "message_date"]


def scorecard_from_corpus(corpus_ds) -> pd.DataFrame:
    """Scorecard straight from the raw corpus via the fully-fused kernel —
    the fast path when no entities stage boundary exists yet."""
    partials = (corpus_ds.select_columns(SCORECARD_INPUT_COLS)
                .map_batches(fused_scorecard_partials_batch,
                             batch_format="pyarrow")
                .materialize())
    merged = partials.groupby("repo").map_groups(merge_partials_group,
                                                 batch_format="pandas")
    return finalize_scorecard(merged.to_pandas())
