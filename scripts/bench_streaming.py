"""Data-size streaming proof for the r4+ boundary-writing suite shape
(VERDICT r4 next-step #6): run the full ``build_kg`` pipeline (fused tag
pass → stored entity boundary → triples/nodes/edges/scorecard) at two
corpus sizes an order of magnitude apart and report throughput plus
per-process PEAK heap (VmHWM from /proc, scanned over the live Ray worker
processes after the run).

The claim under test: the suite streams — rows/s holds flat (within the
documented host-window noise) and worker peak heap stays bounded as the
input grows 10×, because every stage is map_batches over bounded blocks and
the only materialized tables are vocabulary-sized boundaries.

Usage: python scripts/bench_streaming.py [n_rows]
(one size per process so VmHWM is attributable; the driver runs it twice).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000


def _worker_peak_heap_mb() -> dict:
    """Max VmHWM (peak RSS) over live ray worker processes + the driver."""
    peaks = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "ray::" not in cmd and "default_worker.py" not in cmd:
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peaks.append(int(line.split()[1]) // 1024)
                        break
        except (OSError, PermissionError):
            continue
    me = 0
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                me = int(line.split()[1]) // 1024
                break
    return {"max_worker_peak_mb": max(peaks) if peaks else 0,
            "n_workers_seen": len(peaks), "driver_peak_mb": me}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from bench import ensure_corpus, host_canary
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        build_kg_from_corpus)

    canary = host_canary()
    corpus_dir = ensure_corpus(N_ROWS)
    out = f"/tmp/bench_stream_kg_{N_ROWS}"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    build_kg_from_corpus(lambda: rd.read_parquet(corpus_dir), out,
                         fingerprint=f"stream-{N_ROWS}")
    wall = time.time() - t0

    heap = _worker_peak_heap_mb()
    print(json.dumps({
        "metric": "build_kg_streaming",
        "n_rows": N_ROWS,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(N_ROWS / wall, 1),
        "host_canary_msgs_per_sec": canary,
        **heap,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
