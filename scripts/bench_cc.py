"""Large-graph scale proof for the BSP connected-components kernel
(``stages/dedup.connected_components``) on its WORST-CASE topology.

The dedup/KG proofs exercise CC on band-collision near-cliques (diameter
2-3, converges in a couple of rounds).  The claimed scale property is
stronger: O(log diameter) rounds via pointer jumping (Rastogi et al. 2013),
which only long PATHS can falsify.  This bench builds a synthetic pair list
of pure paths — N vertices in chains of length ``k`` (diameter k-1) — runs
CC, and checks the EXACT ground truth (every vertex's cluster must equal
its chain's minimum, ``(v // k) * k``), reporting rounds and wall at two
sizes.  A naive min-label propagation needs k-1 ≈ 63 rounds here; the
pointer-jumping kernel should need ~log2(k) + the fixpoint-witness round.

Usage: python scripts/bench_cc.py [n_vertices] [chain_len]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def _make_pairs(path: str, n: int, k: int) -> int:
    """Chains of length k over vertex ids 0..n-1: edges (v, v+1) for every
    v not at a chain boundary.  Deterministic; written once per (n, k)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(path, "_DONE")):
        return n - n // k
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    n_edges = 0
    chunk = 4_000_000
    for i, lo in enumerate(range(0, n, chunk)):
        v = np.arange(lo, min(lo + chunk, n), dtype=np.int64)
        v = v[(v % k) != k - 1]
        v = v[v + 1 < n]
        pq.write_table(pa.table({"id_a": v, "id_b": v + 1}),
                       os.path.join(path, f"part_{i:04d}.parquet"))
        n_edges += len(v)
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write(str(n_edges))
    return n_edges


def main() -> None:
    import ray
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        connected_components)

    pairs_dir = f"/tmp/bench_cc_pairs_{N}_{K}"
    n_edges = _make_pairs(pairs_dir, N, K)

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bench import host_canary

    canary = host_canary()
    stats: dict = {}
    out = f"/tmp/bench_cc_out_{N}_{K}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    cc = connected_components(rd.read_parquet(pairs_dir),
                              num_partitions=32, stats=stats)
    cc.write_parquet(out)
    wall = time.time() - t0

    import duckdb

    nv, n_comp, n_wrong = duckdb.sql(
        f"SELECT count(*), count(DISTINCT cluster_id), "
        f"sum(CASE WHEN cluster_id <> (doc_id // {K}) * {K} THEN 1 "
        f"ELSE 0 END) FROM read_parquet('{out}/*.parquet')").fetchone()

    print(json.dumps({
        "metric": "cc_path_graph",
        "n_vertices": N, "chain_len": K, "n_edges": n_edges,
        "rounds": stats.get("rounds"),
        "wall_sec": round(wall, 2),
        "edges_per_sec": round(n_edges / wall, 1),
        "host_canary_msgs_per_sec": canary,
        "out_vertices": int(nv),
        "n_components": int(n_comp),
        "expected_components": (N + K - 1) // K,
        "n_wrong_labels": int(n_wrong),
        "exact": int(nv) == N and int(n_wrong) == 0
        and int(n_comp) == (N + K - 1) // K,
    }))
    ray.shutdown()
    sys.exit(0 if (int(n_wrong) == 0 and int(nv) == N) else 1)


if __name__ == "__main__":
    main()
