"""Incremental-update scale proof (VERDICT r4 next-step #8): demonstrate the
delta path costs O(delta), not O(total), at sf0.1 scale.

Three timed runs on one 32-CPU session shape:
  1. full build_kg over a 50k-row corpus (the sf0.1-equivalent base),
  2. full REBUILD over base+delta (50.5k rows — what a non-incremental
     system pays per day),
  3. incremental_update of the 1% delta onto the stored base (what this
     engine pays: tags ONLY the delta, merges vocabulary-sized aggregates).

Prints one JSON line; the result is recorded in BASELINE.md.

Usage: python scripts/bench_incremental.py [base_rows] [delta_pct]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DELTA_PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import ray.data as rd

    from bench import ensure_corpus, host_canary
    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import (
        incremental_update)
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        build_kg_from_corpus)
    from amharic_ecommerce_data_extractor_ray.sources.corpus import (
        corpus_batch)

    n_delta = int(BASE_ROWS * DELTA_PCT / 100)
    canary = host_canary()

    base_dir = ensure_corpus(BASE_ROWS)
    full_dir = ensure_corpus(BASE_ROWS + n_delta)

    def factory(d):
        return lambda: rd.read_parquet(d)

    out_base = "/tmp/bench_incr_base"
    out_full = "/tmp/bench_incr_full"
    shutil.rmtree(out_base, ignore_errors=True)
    shutil.rmtree(out_full, ignore_errors=True)

    t0 = time.time()
    build_kg_from_corpus(factory(base_dir), out_base,
                         fingerprint=f"bench-base-{BASE_ROWS}")
    t_base = time.time() - t0

    t0 = time.time()
    build_kg_from_corpus(factory(full_dir), out_full,
                         fingerprint=f"bench-full-{BASE_ROWS + n_delta}")
    t_full_rebuild = time.time() - t0

    # the 1% delta: the NEXT id range, same generator as the corpus
    delta_ds = rd.from_arrow(
        corpus_batch(np.arange(BASE_ROWS, BASE_ROWS + n_delta)))
    t0 = time.time()
    stats = incremental_update(out_base, delta_ds, delta_name="bench_d1",
                               fingerprint=f"bench-delta-{n_delta}")
    t_delta = time.time() - t0

    print(json.dumps({
        "metric": "incremental_update_sf0.1",
        "base_rows": BASE_ROWS,
        "delta_rows": n_delta,
        "t_full_base_sec": round(t_base, 2),
        "t_full_rebuild_sec": round(t_full_rebuild, 2),
        "t_delta_sec": round(t_delta, 2),
        "delta_vs_rebuild": round(t_delta / t_full_rebuild, 3),
        "delta_messages": stats.get("delta_messages"),
        "host_canary_msgs_per_sec": canary,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
