"""IVF / IVF-PQ ANN benchmark at realistic scale (VERDICT r3 #8).

Generates a DETERMINISTIC 1M x 64 clustered embeddings table (64 Gaussian
clusters — the structure real embedding corpora have and ANN exploits),
then measures, against exact brute-force cosine ground truth:

- ``ivf_topk`` recall@10 + wall time across the n_probe sweep (the
  recall/cost dial an IVF deployment tunes), and
- ``pq_adc_topk`` recall@10 + wall time (the compressed-scan path).

Usage:  python scripts/bench_ivfpq.py [n_rows]
Prints one JSON line per configuration plus a summary table; results are
recorded in BASELINE.md.  Dataset is cached under /tmp and reused.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
N_TRUE_CLUSTERS = 64
CHUNK = 100_000
SEED = 20260819
QUERY_IDS = list(range(100))
K = 10
OUT = f"/tmp/ivfpq_bench_v2_{N_ROWS}"


def ensure_dataset() -> str:
    if os.path.exists(f"{OUT}/_DONE"):
        return OUT
    os.makedirs(OUT, exist_ok=True)
    rng0 = np.random.default_rng(SEED)
    centers = rng0.normal(size=(N_TRUE_CLUSTERS, DIM)).astype(np.float32)
    for ci, start in enumerate(range(0, N_ROWS, CHUNK)):
        n = min(CHUNK, N_ROWS - start)
        rng = np.random.default_rng(SEED + 1 + ci)
        labels = rng.integers(0, N_TRUE_CLUSTERS, size=n)
        vecs = (centers[labels]
                + 0.35 * rng.normal(size=(n, DIM)).astype(np.float32))
        # unit-normalize: makes L2 rank order equal cosine rank order, so
        # the ADC (L2) path is graded against the same ground truth
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), DIM).cast(
                    pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        })
        pq.write_table(tbl, f"{OUT}/part_{ci:03d}.parquet")
    with open(f"{OUT}/_DONE", "w") as f:
        f.write(str(N_ROWS))
    return OUT


def recall_at_k(approx_df, exact_df) -> float:
    hits, total = 0, 0
    exact_by_q = {q: set(g["neighbor_id"])
                  for q, g in exact_df.groupby("query_id")}
    for q, g in approx_df.groupby("query_id"):
        e = exact_by_q[q]
        hits += len(set(g["neighbor_id"]) & e)
        total += len(e)
    return hits / total


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        brute_force_topk, ivf_topk, pq_adc_rerank_topk, pq_adc_topk)

    path = ensure_dataset()

    def ds():
        return rd.read_parquet(path, columns=["vec_id", "embedding"])

    results = []

    t0 = time.time()
    exact = brute_force_topk(ds(), QUERY_IDS, k=K).to_pandas()
    t_exact = time.time() - t0
    results.append({"method": "brute_force", "recall_at_10": 1.0,
                    "sec": round(t_exact, 2)})

    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        approx = ivf_topk(ds(), QUERY_IDS, k=K, n_clusters=64,
                          n_probe=n_probe, sample=8192).to_pandas()
        sec = time.time() - t0
        results.append({"method": f"ivf_topk n_probe={n_probe}",
                        "recall_at_10": round(recall_at_k(approx, exact), 3),
                        "sec": round(sec, 2)})

    for m, kc in ((8, 256), (16, 256)):
        t0 = time.time()
        adc = pq_adc_topk(ds(), QUERY_IDS, k=K, m_subspaces=m,
                          k_codes=kc, n_iter=3)  # returns a DataFrame
        sec = time.time() - t0
        results.append({"method": f"pq_adc m={m} k_codes={kc}",
                        "recall_at_10": round(recall_at_k(adc, exact), 3),
                        "sec": round(sec, 2)})

    for shortlist in (100, 500):
        t0 = time.time()
        rr = pq_adc_rerank_topk(ds(), QUERY_IDS, k=K, shortlist=shortlist,
                                m_subspaces=8, k_codes=256, n_iter=3)
        sec = time.time() - t0
        results.append({"method": f"pq_adc_rerank m=8 k_codes=256 "
                                  f"L={shortlist}",
                        "recall_at_10": round(recall_at_k(rr, exact), 3),
                        "sec": round(sec, 2)})

    for r in results:
        print(json.dumps({"n_rows": N_ROWS, "dim": DIM, **r}))
    ray.shutdown()


if __name__ == "__main__":
    main()
