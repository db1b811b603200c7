"""Incremental KG maintenance — the daily-delta path a 100 TB deployment
runs instead of full rebuilds.

``incremental_update(prev_out, delta_corpus)`` appends a new corpus delta to
an existing ``build_kg`` output directory:

- ONLY the delta is normalized/tagged (the expensive pass); its message
  boundary lands under ``<prev>/messages/delta_<name>/`` (plain subdir — a
  recursive read unions it with the base shards) and its triples under
  ``<prev>/triples_deltas/<name>/`` (kept beside the pred-partitioned base
  triples; "all triples" = read both roots) — old raw data is never re-read.
- nodes/edges/scorecard are ALGEBRAIC VIEWS and merge incrementally:
  edge weights and entity mention counts are sums, canonical labels are
  mins, the scorecard re-derives from stored message boundaries (small,
  content-free).  Merged aggregates are rewritten in place — at scale the
  aggregate tables are vocabulary-sized, not corpus-sized.

Invariant (pinned by tests/test_incremental.py): build(A) then
incremental(B) produces EXACTLY the same triples/nodes/edges/scorecard
content as build(A ∪ B).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .kg import DEFAULT_BATCH, ENTITY_COLS


def _merged_entity_nodes(prev_nodes_ds, delta_triples_ds):
    """Merge stored entity nodes with delta-triple partials: n_mentions sums,
    label = min over surfaces (min(prev_min, delta_min) = global min)."""
    from ray.data.aggregate import Min, Sum

    from ..stages.canonicalize import entity_partials_batch, node_id

    prev_part = prev_nodes_ds.map_batches(
        lambda b: (b.filter(pc.equal(b["node_type"], "entity"))
                   .select(["pred", "obj_norm", "label", "n_mentions"])
                   .rename_columns(["pred", "obj_norm", "min_obj",
                                    "n_mentions"])),
        batch_format="pyarrow")
    delta_part = delta_triples_ds.map_batches(entity_partials_batch,
                                              batch_format="pyarrow")
    merged = (prev_part.union(delta_part)
              .groupby(["pred", "obj_norm"])
              .aggregate(Min("min_obj", alias_name="min_obj"),
                         Sum("n_mentions", alias_name="n_mentions")))

    def to_nodes(b: pa.Table) -> pa.Table:
        preds = b["pred"].to_pylist()
        norms = b["obj_norm"].to_pylist()
        return pa.table({
            "node_id": [node_id("entity", f"{p}:{n}")
                        for p, n in zip(preds, norms)],
            "node_type": ["entity"] * len(preds),
            "pred": preds,
            "obj_norm": norms,
            "label": b["min_obj"].to_pylist(),
            "n_mentions": b["n_mentions"],
        })

    return merged.map_batches(to_nodes, batch_format="pyarrow")


def _merged_edges(prev_edges_ds, delta_triples_ds):
    """prev edge weights ⊎ delta edge partials → summed weights."""
    from ray.data.aggregate import Sum

    from ..stages.canonicalize import edge_partials_batch, node_id

    prev_part = prev_edges_ds.select_columns(["subj", "pred", "obj_norm",
                                              "weight"])
    delta_part = delta_triples_ds.map_batches(edge_partials_batch,
                                              batch_format="pyarrow")
    merged = (prev_part.union(delta_part)
              .groupby(["subj", "pred", "obj_norm"])
              .aggregate(Sum("weight", alias_name="weight")))

    def to_edges(b: pa.Table) -> pa.Table:
        subjs = b["subj"].to_pylist()
        preds = b["pred"].to_pylist()
        norms = b["obj_norm"].to_pylist()
        return pa.table({
            "src_id": [node_id("vendor", s) for s in subjs],
            "dst_id": [node_id("entity", f"{p}:{n}")
                       for p, n in zip(preds, norms)],
            "subj": subjs,
            "pred": preds,
            "obj_norm": norms,
            "weight": b["weight"],
        })

    return merged.map_batches(to_edges, batch_format="pyarrow")


def _refresh_scorecard_partials(prev_out: str, delta_name: str,
                                delta_msg_dir: str, agg_fp: str,
                                new_applied: list[str]) -> int:
    """Fold ``delta_name``'s scorecard partials into the STORED vendor-sized
    partials table (``scorecard_partials/``) and rewrite scorecard.parquet.

    O(delta): the per-vendor partials are mergeable (merge_partials_group is
    schema-closed and associative), so each update folds only the delta's
    partials; the first update after a plain build_kg seeds the store by
    folding the existing boundaries once (which already include the
    just-written delta).  Previously the scorecard rescanned every stored
    message boundary — the one O(total) term left in the delta path
    (measured ~8 s of a 31 s delta at a 10M-row base, growing forever).

    Idempotent via the same applied_deltas manifest discipline as
    nodes/edges, and callable from BOTH the main path and the
    already-applied early return: a crash between the nodes/edges rewrite
    and this step leaves the delta recorded in the nodes manifest but not
    here, and the re-run repairs the scorecard instead of skipping it."""
    import ray.data as rd

    from ..stages.scorecard import (_PARTIAL_SCHEMA, finalize_scorecard,
                                    merge_partials_group,
                                    scorecard_partials_batch)

    partials_dir = f"{prev_out}/scorecard_partials"
    pmani = _read_sub_manifest(partials_dir)
    if pmani is not None and delta_name in pmani.get("applied_deltas", []):
        merged_pdf = rd.read_parquet(partials_dir).to_pandas()
    else:
        if pmani is None:
            src = (rd.read_parquet(f"{prev_out}/messages")
                   .map_batches(scorecard_partials_batch,
                                batch_format="pyarrow"))
        else:
            src = rd.read_parquet(partials_dir).union(
                rd.read_parquet(delta_msg_dir)
                .map_batches(scorecard_partials_batch,
                             batch_format="pyarrow"))
        merged_pdf = (src.materialize()
                      .groupby("repo")
                      .map_groups(merge_partials_group,
                                  batch_format="pandas")
                      .to_pandas())
        merged_tbl = (pa.Table.from_pandas(merged_pdf, preserve_index=False)
                      .select(_PARTIAL_SCHEMA.names).cast(_PARTIAL_SCHEMA))
        _rewrite_aggregate(rd.from_arrow(merged_tbl), partials_dir,
                           fingerprint=agg_fp, applied_deltas=new_applied)
    sc = finalize_scorecard(merged_pdf)
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(sc, preserve_index=False),
                   f"{prev_out}/scorecard/scorecard.parquet")
    return len(sc)


def _read_sub_manifest(path: str) -> dict | None:
    import json
    import os

    mp = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def _rewrite_aggregate(ds, out_dir: str, *, fingerprint: str,
                       applied_deltas: list[str],
                       partition_on: str | None = None) -> int:
    """Atomically replace an aggregate view (nodes/edges) and stamp a
    delta-aware ``_MANIFEST.json`` recording which deltas it contains —
    ADVICE r2: the r2 rewrite destroyed the checkpoint manifest and dropped
    the ``pred`` hive partitioning, so a later ``build_kg`` resume silently
    rebuilt nodes/edges from the base triples only."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_on is not None:
        ds.write_parquet(tmp, partition_cols=[partition_on])
    else:
        ds.write_parquet(tmp)
    rows = 0
    for root, _dirs, files in os.walk(tmp):
        rows += sum(pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
                    for fn in files if fn.endswith(".parquet"))
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump({"rows": rows, "fingerprint": fingerprint,
                   "partition_on": partition_on,
                   "applied_deltas": applied_deltas}, f)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return rows


def applied_deltas(prev_out: str) -> list[str]:
    """Delta names already merged into the nodes aggregate (empty for a
    fresh ``build_kg`` output)."""
    m = _read_sub_manifest(f"{prev_out}/nodes") or {}
    return list(m.get("applied_deltas", []))


def incremental_update(prev_out: str, delta_corpus, *,
                       delta_name: str = "d1",
                       fingerprint: str | None = None) -> dict:
    """Append ``delta_corpus`` (a corpus-schema Dataset) to the build at
    ``prev_out``.  Tags ONLY the delta; merges the aggregate views.

    Crash-safe and idempotent (ADVICE r2): every delta dataset is staged via
    ``checkpointed_write`` (tmp + atomic rename + fingerprinted manifest);
    the nodes/edges rewrites record ``applied_deltas`` in their manifests, so
    a rerun after a crash skips completed phases and never double-applies a
    delta — and a NAME COLLISION (same ``delta_name``, different data) fails
    fast instead of silently double-counting.

    ``fingerprint`` identifies the delta's content (e.g.
    ``_input_fingerprint(corpus_dir)``); required to make reruns skip-able —
    when None, an existing delta dir of the same name always raises."""
    import ray.data as rd

    from ..state.checkpoint import checkpointed_write
    from ..stages.canonicalize import vendor_nodes
    from ..stages.enrich import (fused_entities_batch,
                                 triples_from_entities_batch)

    import time as _time

    stats: dict = {}
    timings: dict = {}
    _t0 = _time.time()

    def _mark(phase):
        nonlocal _t0
        timings[phase] = round(_time.time() - _t0, 3)
        _t0 = _time.time()

    delta_msg_dir = f"{prev_out}/messages/delta_{delta_name}"
    delta_tri_dir = f"{prev_out}/triples_deltas/{delta_name}"

    # fail fast on delta-name reuse with different (or unverifiable) content
    for d in (delta_msg_dir, delta_tri_dir):
        m = _read_sub_manifest(d)
        if m is not None and (fingerprint is None
                              or m.get("fingerprint") != fingerprint):
            raise ValueError(
                f"incremental_update: {d} already exists from a previous "
                f"delta (fingerprint {m.get('fingerprint')!r} vs "
                f"{fingerprint!r}) — delta names must be unique per day's "
                f"data; pass a fresh delta_name (ADVICE r2: reusing the dir "
                f"would double-count the old delta into the aggregates)")

    already = applied_deltas(prev_out)
    if delta_name in already:
        if fingerprint is not None and (_read_sub_manifest(delta_msg_dir)
                                        or {}).get("fingerprint") == fingerprint:
            # fully applied earlier — idempotent no-op for nodes/edges, but
            # REPAIR the scorecard if a crash landed between the nodes
            # rewrite (which records the delta) and the partials rewrite
            # (which did not run): skipping here would drop the delta from
            # the scorecard forever
            agg_fp_done = "+".join(["incremental"] + already)
            n_sc = _refresh_scorecard_partials(
                prev_out, delta_name, delta_msg_dir, agg_fp_done, already)
            return {"delta_messages": (_read_sub_manifest(delta_msg_dir)
                                       or {}).get("rows", 0),
                    "scorecard": n_sc,
                    "skipped": True}
        raise ValueError(
            f"incremental_update: delta {delta_name!r} is already merged "
            f"into {prev_out}/nodes but its content cannot be verified — "
            f"refusing to re-apply")

    # 1. delta message boundary (the ONLY tagging pass) — appended as a new
    #    partition directory; previous message shards untouched.  Atomic +
    #    fingerprint-skipped via checkpointed_write.
    res = checkpointed_write(
        delta_corpus.map_batches(fused_entities_batch, batch_format="pyarrow",
                                 batch_size=DEFAULT_BATCH)
        .select_columns(ENTITY_COLS),
        delta_msg_dir, fingerprint=fingerprint)
    stats["delta_messages"] = res["rows"]
    _mark("tag_delta")

    # 2. delta triples — appended alongside the previous triples partitions
    res = checkpointed_write(
        rd.read_parquet(delta_msg_dir).map_batches(
            triples_from_entities_batch, batch_format="pyarrow",
            batch_size=DEFAULT_BATCH),
        delta_tri_dir, fingerprint=fingerprint)
    stats["delta_triples"] = res["rows"]
    _mark("triples_delta")
    delta_triples_stored = rd.read_parquet(delta_tri_dir)

    # 3. merge aggregate views (vocabulary-sized rewrites).  The delta-aware
    #    fingerprint chains base + applied delta names, so build_kg can never
    #    mistake a merged aggregate for its own resumable output.
    prev_nodes = rd.read_parquet(f"{prev_out}/nodes")
    prev_edges = rd.read_parquet(f"{prev_out}/edges")
    new_applied = already + [delta_name]
    agg_fp = "+".join(["incremental"] + new_applied)

    # vendor nodes: distinct union of previous vendor nodes + delta vendors
    # (from the STORED delta boundary — the raw delta is never re-read)
    prev_vendors = prev_nodes.map_batches(
        lambda b: b.filter(pc.equal(b["node_type"], "vendor")),
        batch_format="pyarrow")
    new_vendors = vendor_nodes(
        rd.read_parquet(delta_msg_dir).select_columns(["repo"]))
    vendors = (prev_vendors.union(new_vendors)
               .groupby("label")
               .map_groups(lambda g: g.head(1), batch_format="pandas"))

    def restore_types(b: pa.Table) -> pa.Table:
        # the pandas round-trip degrades the all-null pred/obj_norm vendor
        # columns to null type, which the union with typed entity nodes
        # cannot cast — restore the string type explicitly
        for c in ("pred", "obj_norm"):
            i = b.schema.get_field_index(c)
            if pa.types.is_null(b.schema.field(i).type):
                b = b.set_column(i, c, pa.nulls(b.num_rows, pa.string()))
        i = b.schema.get_field_index("n_mentions")
        return b.set_column(i, "n_mentions",
                            pc.cast(b["n_mentions"], pa.int64()))

    vendors = vendors.map_batches(restore_types, batch_format="pyarrow")

    # the nodes and edges merges are independent vocabulary-sized jobs
    # whose cost at delta scale is almost entirely per-stage scheduling
    # latency — materialize them CONCURRENTLY (driver threads; Ray jobs
    # are independent) instead of paying the latencies in sequence
    from concurrent.futures import ThreadPoolExecutor

    nodes_lazy = vendors.union(
        _merged_entity_nodes(prev_nodes, delta_triples_stored))
    edges_lazy = _merged_edges(prev_edges, delta_triples_stored)
    with ThreadPoolExecutor(max_workers=2) as pool:
        nodes_f = pool.submit(nodes_lazy.materialize)
        edges_f = pool.submit(edges_lazy.materialize)
        nodes = nodes_f.result()
        edges = edges_f.result()
    _mark("merge_nodes_edges")

    stats["nodes"] = _rewrite_aggregate(nodes, f"{prev_out}/nodes",
                                        fingerprint=agg_fp,
                                        applied_deltas=new_applied)
    stats["edges"] = _rewrite_aggregate(edges, f"{prev_out}/edges",
                                        fingerprint=agg_fp,
                                        applied_deltas=new_applied,
                                        partition_on="pred")
    _mark("rewrite_aggregates")

    # 4. scorecard — O(delta) via the stored mergeable partials (see
    #    _refresh_scorecard_partials; also invoked from the already-applied
    #    early return so a crash before this point is repaired on re-run)
    stats["scorecard"] = _refresh_scorecard_partials(
        prev_out, delta_name, delta_msg_dir, agg_fp, new_applied)
    _mark("scorecard")
    stats["timings"] = timings
    return stats
