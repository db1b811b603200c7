"""Checkpointed, resumable Parquet output with per-partition lineage.

"Resumable from checkpoint" for a batch pipeline (north rule) means: output
laid out as one directory per logical partition, written atomically, plus a
manifest recording what completed — a rerun skips partitions whose manifest
entry is present and fingerprint-matched (ray_guide "Sources & sinks").

Layout:
    <out>/<name>/...parquet            (ds.write_parquet, partitioned)
    <out>/<name>/_MANIFEST.json        per-dataset: rows, input fingerprint
    <out>/MANIFEST.json                per-run: inputs, datasets, metrics
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _input_fingerprint(sf_dir: str) -> str:
    """Cheap, deterministic fingerprint of the input: file names+sizes+mtimes."""
    import hashlib

    h = hashlib.sha256()
    if os.path.isdir(sf_dir):
        for name in sorted(os.listdir(sf_dir)):
            p = os.path.join(sf_dir, name)
            st = os.stat(p)
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        h.update(sf_dir.encode())
    return h.hexdigest()[:16]


def checkpointed_write(ds, out_dir: str, *, partition_on: str | None = None,
                       fingerprint: str | None = None) -> dict:
    """Write ``ds`` to ``out_dir`` unless a complete, fingerprint-matching
    manifest already exists (then skip — resume path).  Writes to a temp dir
    and renames, so partial failures never leave a half-complete 'done' dir.
    Returns {"rows": n, "skipped": bool}.
    """
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if fingerprint is None or m.get("fingerprint") == fingerprint:
            return {"rows": m["rows"], "skipped": True}

    tmp_dir = out_dir.rstrip("/") + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    t0 = time.time()
    if partition_on is not None:
        ds.write_parquet(tmp_dir, partition_cols=[partition_on])
    else:
        ds.write_parquet(tmp_dir)
    # count rows from the written files (cheap metadata scan)
    import pyarrow.parquet as pq
    rows = 0
    for root, _dirs, files in os.walk(tmp_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                rows += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump({"rows": rows, "fingerprint": fingerprint,
                   "wall_sec": round(time.time() - t0, 3),
                   "partition_on": partition_on}, f)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp_dir, out_dir)
    return {"rows": rows, "skipped": False}


def write_manifest(out_dir: str, sf_dir: str, stats: dict) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "input": sf_dir,
        "input_fingerprint": _input_fingerprint(sf_dir),
        "datasets": stats,
        "completed_at": time.time(),
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def shard_files(paths: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic round-robin grouping of input files into shards."""
    paths = sorted(paths)
    n_shards = max(1, min(n_shards, len(paths)))
    return [paths[i::n_shards] for i in range(n_shards)]


def sharded_checkpointed_write(make_ds, input_paths: list[str], out_dir: str,
                               *, n_shards: int = 16,
                               on_shard_done=None) -> dict:
    """Per-partition resumable build: split ``input_paths`` into ``n_shards``
    deterministic file groups, run ``make_ds(shard_paths) -> Dataset`` for
    each, and write each shard's output under ``<out>/shard=<i>/`` with its
    own fingerprinted manifest.  A rerun (after a crash anywhere) skips every
    completed shard and redoes only the one that was in flight — the
    "per-partition lineage + metrics" resume unit of the north rule, bounded
    re-work at 100 TB where a whole-dataset restart is not an option.

    ``on_shard_done(i, result)`` is a test/metrics hook (e.g. to simulate a
    crash after shard k).  Returns the run manifest.
    """
    import hashlib

    shards = shard_files(input_paths, n_shards)
    stats: dict[str, dict] = {}
    for i, paths in enumerate(shards):
        h = hashlib.sha256()
        for p in paths:
            st = os.stat(p)
            # size alone misses same-size content edits — mtime_ns catches
            # them so resume never serves stale shard output
            h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        fp = h.hexdigest()[:16]
        res = checkpointed_write(make_ds(paths),
                                 os.path.join(out_dir, f"shard={i}"),
                                 fingerprint=fp)
        stats[f"shard={i}"] = {**res, "n_files": len(paths),
                               "fingerprint": fp}
        if on_shard_done is not None:
            on_shard_done(i, res)
    manifest = {"n_shards": len(shards), "shards": stats,
                "completed_at": time.time()}
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
