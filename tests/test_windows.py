"""Window pipelines: the vectorized explode kernel vs the retired row loop."""

import datetime as dt

import numpy as np
import pyarrow as pa


def _rowloop_explode_reference(b: pa.Table, window_hours: int = 3) -> pa.Table:
    """The retired per-row strftime loop (pre-round-3), kept verbatim as the
    differential reference for make_window_explode_kernel."""
    types = b["event_type"].to_pylist()
    tss = b["ts"].to_pylist()
    vals = b["value"].to_pylist()
    out_t, out_w, out_v = [], [], []
    for et, ts, v in zip(types, tss, vals):
        hour = ts.replace(minute=0, second=0, microsecond=0)
        for off in range(window_hours):
            start = hour - dt.timedelta(hours=off)
            out_t.append(et)
            out_w.append(start.strftime("%Y-%m-%d %H:00:00"))
            out_v.append(v)
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "window_start": pa.array(out_w, pa.string()),
        "value": pa.array(out_v, pa.float64()),
    })


def test_window_explode_matches_rowloop():
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        make_window_explode_kernel)

    n = 5000
    rng = np.random.default_rng(7)
    # span several days incl. day/month boundaries so label arithmetic is
    # exercised across boundaries, with second-level jitter
    base = (np.datetime64("2024-04-29T22:11:07")
            + rng.integers(0, 86400 * 40, n).astype("timedelta64[s]"))
    b = pa.table({
        "event_type": pa.array([f"t{i % 5}" for i in range(n)]),
        "ts": pa.array(base),
        "value": pa.array(rng.random(n)),
    })
    for w in (1, 3, 5):
        new = (make_window_explode_kernel(w)(b).to_pandas()
               .sort_values(["event_type", "window_start", "value"])
               .reset_index(drop=True))
        ref = (_rowloop_explode_reference(b, w).to_pandas()
               .sort_values(["event_type", "window_start", "value"])
               .reset_index(drop=True))
        assert new.equals(ref), f"window_hours={w} mismatch"
