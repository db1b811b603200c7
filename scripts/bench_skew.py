"""Hot-key skew stress proof for the scorecard groupby family.

The claim under test (BASELINE.md "Pipeline audit": "salting is unnecessary
by construction"): every scorecard-family groupby folds PER-BATCH PARTIALS
(`scorecard_partials_batch` emits ≤ n_vendors rows per input block), so a
vendor owning 90% of the corpus contributes the same number of shuffle rows
as a vendor owning 0.1% — the hot key never concentrates data, and wall
time is invariant to key skew.  This script measures that invariance
directly: the stock bench corpus (mega-vendor ≈ 30% of rows by design,
sources/corpus.py:10) vs a 90%-skew rewrite of the SAME rows, scorecard
over both in one process, one window.

A naive groupby-then-aggregate engine degrades here: the 90% key's
partition holds 0.9 × n_rows and its single reducer becomes the pipeline.
The partial-fold design is the scale answer this proof pins.

Usage: python scripts/bench_skew.py [n_rows] [hot_share_tenths]
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
# hot vendor owns HOT_TENTHS/10 of all rows (stock corpus: 3/10)
HOT_TENTHS = int(sys.argv[2]) if len(sys.argv) > 2 else 9


def ensure_skewed(stock_dir: str) -> str:
    """Rewrite the stock corpus's ``repo`` so vendor_000 owns
    HOT_TENTHS/10 of rows (same content/views/dates — only the group key
    moves, so any wall-time delta is attributable to skew alone)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/bench_skew_corpus_{N_ROWS}_{HOT_TENTHS}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in sorted(glob.glob(os.path.join(stock_dir, "*.parquet"))):
        t = pq.read_table(f)
        ids = t["message_id"].to_numpy()
        vendor_no = (ids % 17) + 1
        repo = np.where(
            ids % 10 < HOT_TENTHS,
            "vendor_000",
            np.char.add("vendor_",
                        np.char.zfill(vendor_no.astype(str), 3)),
        )
        t = t.set_column(t.schema.get_field_index("repo"), "repo",
                         pa.array(repo.tolist(), type=pa.string()))
        pq.write_table(t, os.path.join(out, os.path.basename(f)))
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write(str(N_ROWS))
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from bench import ensure_corpus, host_canary
    from amharic_ecommerce_data_extractor_ray.stages.scorecard import (
        scorecard_from_corpus)

    stock_dir = ensure_corpus(N_ROWS)
    skew_dir = ensure_skewed(stock_dir)

    def run(path: str) -> tuple[float, int]:
        t0 = time.time()
        df = scorecard_from_corpus(rd.read_parquet(path))
        return time.time() - t0, len(df)

    run(stock_dir)  # warm both code paths + page cache once
    c0 = host_canary()
    wall_stock, n_stock = run(stock_dir)
    c1 = host_canary()
    wall_skew, n_skew = run(skew_dir)
    c2 = host_canary()

    print(json.dumps({
        "metric": "scorecard_skew_invariance",
        "n_rows": N_ROWS,
        "hot_vendor_share_stock": 0.3,
        "hot_vendor_share_skewed": HOT_TENTHS / 10,
        "wall_sec_stock": round(wall_stock, 2),
        "wall_sec_skewed": round(wall_skew, 2),
        "skew_over_stock": round(wall_skew / wall_stock, 3),
        "n_vendors_stock": n_stock,
        "n_vendors_skewed": n_skew,
        "host_canaries": [c0, c1, c2],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
