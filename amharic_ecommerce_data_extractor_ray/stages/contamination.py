"""Benchmark contamination check — the eval-set n-gram overlap scan every
LLM training-data pipeline runs before a model ships (the decontamination
step of GPT-3 appendix C / PaLM / Llama data cards: flag training documents
sharing verbatim n-grams with held-out benchmarks).

Shape at 100 TB: the BENCHMARK side (eval suites) is small and fixed — a few
million distinct n-grams — while the corpus side is the full crawl.  So this
is a broadcast semi-probe, not a shuffle join: the distinct benchmark n-gram
hash set is built once (itself a distributed distinct over the benchmark
docs), `ray.put` into the object store, and every corpus task probes it with
a vectorized sorted-array membership test (`np.isin`).  No all-to-all; the
corpus side streams.  (Were the benchmark side ever too big to broadcast,
the same probe degrades gracefully to the Bloom-prefiltered semi join in
stages/joins.py.)

Hashes are the engine-standard ``md5_number_lower``-compatible u64
(stages/sketch._h64), so the DuckDB oracle recomputes the identical set
membership in pure SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import _h64


def _doc_gram_hashes(text: str | None, n: int) -> set[int]:
    """Distinct hashes of the doc's space-token n-grams (n consecutive
    tokens re-joined with single spaces — mirrors the oracle's
    ``array_to_string(ts[i:i+n-1], ' ')``)."""
    toks = (text or "").split(" ")
    if len(toks) < n:
        return set()
    return {_h64(" ".join(toks[i:i + n]))
            for i in range(len(toks) - n + 1)}


def benchmark_gram_hashes(bench_ds, *, text_col: str = "text",
                          n: int = 3) -> np.ndarray:
    """Distinct n-gram hash set of the benchmark docs, as a SORTED u64
    array ready for `np.isin` probing.

    Distributed distinct: per-batch local sets → native groupby("h") —
    the shuffle carries only distinct hashes per block — and the driver
    collects the final distinct column ONCE (bounded by the benchmark's
    n-gram vocabulary, which is small by construction; that bound is the
    documented broadcast assumption of this operator)."""
    def partial(b: pa.Table) -> pa.Table:
        hs: set[int] = set()
        for t in b[text_col].to_pylist():
            hs |= _doc_gram_hashes(t, n)
        arr = np.fromiter(hs, dtype=np.uint64, count=len(hs))
        # signed view: Ray's groupby block conversion chokes on u64 values
        # above 2^63 (falls back to pickled objects); the int64 view is a
        # bijection so distinct/membership semantics are unchanged
        return pa.table({"h": pa.array(arr.view(np.int64), pa.int64())})

    distinct = (bench_ds.select_columns([text_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby("h").count())
    df = distinct.to_pandas()
    if "h" not in df.columns:  # empty benchmark → schema-less empty Dataset
        return np.empty(0, dtype=np.int64)
    return np.sort(df["h"].to_numpy().astype(np.int64))


def ngram_contamination(docs_ds, bench_ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        flag_threshold: int = 5):
    """Per-document benchmark overlap: (doc_id, n_hit, contaminated) for
    every doc sharing ≥ 1 distinct n-gram with the benchmark set.

    ``n_hit`` = number of DISTINCT n-grams of the doc that appear anywhere
    in the benchmark; ``contaminated`` flags docs at/above
    ``flag_threshold`` (the quarantine list a curation run would drop)."""
    import ray

    bench_ref = ray.put(benchmark_gram_hashes(bench_ds, text_col=text_col,
                                              n=n))

    def probe(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids, hits = [], []
        for i, t in enumerate(b[text_col].to_pylist()):
            hs = _doc_gram_hashes(t, n)
            if not hs:
                continue
            arr = np.fromiter(hs, dtype=np.uint64,
                              count=len(hs)).view(np.int64)
            cnt = int(np.isin(arr, bench, assume_unique=True).sum())
            if cnt > 0:
                ids.append(i)
                hits.append(cnt)
        sel = b[id_col].take(pa.array(ids, pa.int64()))
        return pa.table({
            id_col: sel,
            "n_hit": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h >= flag_threshold for h in hits],
                                     pa.bool_()),
        })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow")
