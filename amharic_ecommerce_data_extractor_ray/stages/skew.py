"""Explicit skew handling: salted two-phase groupby (north rule).

The engine's first skew answer is the combiner pattern (per-batch partial
aggregation — see stages/scorecard.py, stages/canonicalize.py): a mega-vendor
owning 30% of all rows contributes one partial row per block, same as anyone
else, so no salting is needed for algebraic aggregates.

This module covers the remaining case: per-group computations that are
mergeable but NOT expressible as per-batch combiners (e.g. a `map_groups`
UDF that needs all of a group's *partial* state together, or when batches
are too small for per-batch combining to shrink anything).  `salted_groupby`
splits each hot key into `n_salts` sub-groups — `(key, hash(row) % S)` —
aggregates the salted groups in parallel (phase 1 spreads a hot key over S
reducers), then merges the S partials per key (phase 2, tiny).

Reference context: the reference has no parallelism, so skew is a pure
new-design concern (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd


def add_salt_batch(batch, *, key_col: str, salt_col: str = "_salt",
                   n_salts: int = 8, seed: int = 0):
    """Append a deterministic salt column: hash of the row index within a
    stable row-id column is NOT available in general, so salt derives from a
    per-row stable hash (crc32 — NOT Python ``hash()``, which is
    PYTHONHASHSEED-randomized per process) of key bytes + a cheap row
    counter — identical across workers/processes given identical block
    contents."""
    import zlib

    import pyarrow as pa

    keys = batch[key_col].to_pylist()
    salts = [zlib.crc32(f"{seed}:{k}:{i}".encode()) % n_salts
             for i, k in enumerate(keys)]
    return batch.append_column(salt_col, pa.array(salts, pa.int32()))


def salted_groupby(ds, key_col: str, phase1: Callable[[pd.DataFrame], pd.DataFrame],
                   phase2: Callable[[pd.DataFrame], pd.DataFrame],
                   *, n_salts: int = 8, seed: int = 0):
    """Two-phase salted aggregation.

    - ``phase1(group_df) -> partial_df`` runs per ``(key, salt)`` group —
      a hot key is processed by up to ``n_salts`` reducers in parallel.
    - ``phase2(partials_df) -> row_df`` merges one key's partials.

    Requirement: phase1's output must be mergeable by phase2 (the usual
    algebraic contract).  Results are identical to an unsalted
    ``groupby(key).map_groups(...)`` — pinned by tests/test_skew.py.
    """
    salted = ds.map_batches(
        lambda b: add_salt_batch(b, key_col=key_col, n_salts=n_salts,
                                 seed=seed),
        batch_format="pyarrow")
    partials = (salted.groupby([key_col, "_salt"])
                .map_groups(phase1, batch_format="pandas"))
    return (partials.materialize()  # end phase-1 plan before the next shuffle
            .groupby(key_col)
            .map_groups(phase2, batch_format="pandas"))


def topk_phase1(k: int, value_col: str):
    """Example mergeable pair: per-group top-k by value."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, value_col).drop(columns=["_salt"])

    return fn


def topk_phase2(k: int, value_col: str):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, value_col)

    return fn


def approx_quantile_phase1(value_col: str, max_sample: int = 4096,
                           seed: int = 0):
    """Mergeable quantile sketch (uniform reservoir per salted group)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value_col].to_numpy()
        if len(vals) > max_sample:
            rng = np.random.default_rng(seed)
            vals = rng.choice(vals, max_sample, replace=False)
        key_cols = [c for c in g.columns if c not in (value_col, "_salt")]
        out = g.iloc[[0]][key_cols].copy()
        out["_sample"] = [vals.tolist()]
        out["_n"] = len(g)
        return out

    return fn


def approx_quantile_phase2(value_col: str, q: float):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        allv = np.concatenate([np.asarray(s) for s in g["_sample"]])
        out = g.iloc[[0]].drop(columns=["_sample", "_n"]).copy()
        out[f"{value_col}_q{int(q * 100)}"] = float(np.quantile(allv, q))
        out["n"] = int(g["_n"].sum())
        return out

    return fn


def skew_broadcast_join(left_ds, right_ds, *, on: str, right_on: str,
                        right_cols: list[str], row_id_col: str,
                        sample_mod: int = 5, hot_threshold: int = 10,
                        num_partitions: int = 16, seed: int = 0):
    """Skew-aware inner join: HOT keys take a broadcast path, the cold
    majority a normal hash-shuffle join — the standard answer when one join
    key owns a disproportionate share of the fact table and would turn one
    shuffle partition into the job's straggler.

    1. Hot-key detection is a deterministic 1/``sample_mod`` row sample
       (crc32 of ``row_id_col`` — per ROW, not per key, so a hot key's
       sample count estimates its true share) → groupby(key).count() →
       keys with sample count ≥ ``hot_threshold``.  The threshold filter
       runs ON the dataset, so the driver only ever collects the hot list
       (Zipf-bounded: few keys can exceed any fixed share).
    2. The hot keys' RIGHT rows are collected (|hot| × payload — small by
       construction) and broadcast once via ``ray.put``; hot left rows
       probe them vectorized (index_in/take) inside map_batches — a hot
       key never passes through the shuffle at all.
    3. Cold rows on both sides take ``Dataset.join``.
    The union of both paths is EXACTLY the plain inner join (the SQL
    oracle); skew handling changes data movement, not semantics.
    """
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    def sample(b: pa.Table) -> pa.Table:
        col = b[row_id_col]
        if pa.types.is_integer(col.type):
            # vectorized splitmix-style mix — no per-row Python
            ids = np.asarray(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col, dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                x = (ids + np.uint64(seed)
                     + np.uint64(0x9E3779B97F4A7C15))
                x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                x ^= x >> np.uint64(31)
            keep = pa.array(x % np.uint64(sample_mod) == 0)
        else:
            keep = pa.array(
                [zlib.crc32(f"{seed}:{v}".encode()) % sample_mod == 0
                 for v in col.to_pylist()])
        return b.filter(keep).select([on])

    hot_rows = (left_ds.map_batches(sample, batch_format="pyarrow")
                .groupby(on).aggregate(Count(alias_name="n"))
                .filter(expr=f"n >= {hot_threshold}")
                .take_all())
    hot_keys = pa.array(sorted(r[on] for r in hot_rows), pa.int64())
    left_names = list(left_ds.schema().names)
    right_proj = right_ds.select_columns([right_on] + right_cols)

    def keep_right(want_hot: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(b[right_on], pa.int64()),
                         value_set=hot_keys)
            return b.filter(m if want_hot else pc.invert(m))
        return fn

    def keep_left(want_hot: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(b[on], pa.int64()), value_set=hot_keys)
            return b.filter(m if want_hot else pc.invert(m))
        return fn

    cold_joined = (left_ds
                   .map_batches(keep_left(False), batch_format="pyarrow")
                   .join(right_proj.map_batches(keep_right(False),
                                                batch_format="pyarrow"),
                         join_type="inner", num_partitions=num_partitions,
                         on=(on,), right_on=(right_on,))
                   .select_columns(left_names + right_cols))
    if len(hot_keys) == 0:
        return cold_joined

    # |hot| × payload rows — small by construction; broadcast ONCE.
    # Assumption (dimension-table contract): right keys are UNIQUE — the
    # vectorized index_in probe attaches the first match per key.
    hot_tables = [t for t in (right_proj
                              .map_batches(keep_right(True),
                                           batch_format="pyarrow")
                              .iter_batches(batch_format="pyarrow"))
                  if t.num_rows]
    if not hot_tables:
        # no right rows for any hot key → the hot side of the inner join
        # is empty and the cold path already holds the full result
        return cold_joined
    ref = ray.put(pa.concat_tables(hot_tables))

    def probe_hot(b: pa.Table) -> pa.Table:
        tbl = ray.get(ref)
        idx = pc.index_in(pc.cast(b[on], pa.int64()),
                          value_set=pc.cast(tbl[right_on], pa.int64())
                          .combine_chunks())
        matched = pc.is_valid(idx)
        b = b.filter(matched)
        idx = idx.filter(matched)
        for c in right_cols:
            b = b.append_column(c, pc.take(tbl[c].combine_chunks(), idx))
        return b

    hot_joined = (left_ds.map_batches(keep_left(True), batch_format="pyarrow")
                  .map_batches(probe_hot, batch_format="pyarrow")
                  .select_columns(left_names + right_cols))
    return cold_joined.union(hot_joined)
