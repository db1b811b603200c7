"""Object-store-pressure proof: the suite completes under a tiny plasma
store by SPILLING, not by OOM or stall.

At 100 TB the object store never holds the working set; correctness under
pressure comes from Ray Data's streaming backpressure plus plasma's disk
spill.  This script runs the full ``build_kg`` suite at N rows with the
object store squeezed to a few hundred MB (vs the ~38 GB default on this
box) and reports wall time plus the spill counters from Ray's memory
summary — the claim is the job finishes with a bounded slowdown vs the
unconstrained run in BASELINE.md's streaming table, with the executor
backpressuring into spill instead of failing.

Usage: python scripts/bench_spill.py [n_rows] [object_store_mb]
(fresh process per configuration so the store size is attributable).
"""

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
STORE_MB = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def _spill_stats(session_dir: str) -> dict:
    """Read cumulative spill/restore counters from the raylet log (the
    gRPC memory-summary API needs grpcio, absent here; the raylet logs the
    same counters whenever spilling actually happens)."""
    out = {}
    try:
        with open(os.path.join(session_dir, "logs", "raylet.out")) as f:
            log = f.read()
        spills = re.findall(r"Spilled (\d+) MiB, (\d+) objects", log)
        if spills:
            out["spilled_mib"], out["spilled_objects"] = map(
                int, spills[-1])
        else:
            out["spilled_mib"] = 0
            out["spilled_objects"] = 0
        restores = re.findall(r"Restored (\d+) MiB, (\d+) objects", log)
        if restores:
            out["restored_mib"], out["restored_objects"] = map(
                int, restores[-1])
        m = re.search(r"Object store current usage [\d.e-]+ / ([\d.]+) GB",
                      log)
        if m:
            out["store_capacity_gb"] = float(m.group(1))
    except OSError as e:  # pragma: no cover - diagnostics only
        out["spill_stats_error"] = repr(e)
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 object_store_memory=STORE_MB * 1024 * 1024,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from bench import ensure_corpus, host_canary
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        build_kg_from_corpus)

    session_dir = ray._private.worker._global_node.get_session_dir_path()

    canary = host_canary()
    corpus_dir = ensure_corpus(N_ROWS)
    out = f"/tmp/bench_spill_kg_{N_ROWS}"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    build_kg_from_corpus(lambda: rd.read_parquet(corpus_dir), out,
                         fingerprint=f"spill-{N_ROWS}")
    wall = time.time() - t0

    print(json.dumps({
        "metric": "build_kg_under_object_store_pressure",
        "n_rows": N_ROWS,
        "object_store_mb": STORE_MB,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(N_ROWS / wall, 1),
        "host_canary_msgs_per_sec": canary,
        **_spill_stats(session_dir),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
