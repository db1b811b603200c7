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


def incremental_update(prev_out: str, delta_corpus, *,
                       delta_name: str = "d1") -> dict:
    """Append ``delta_corpus`` (a corpus-schema Dataset) to the build at
    ``prev_out``.  Tags ONLY the delta; merges the aggregate views."""
    import os
    import shutil

    import ray.data as rd

    from ..stages.canonicalize import vendor_nodes
    from ..stages.enrich import (fused_entities_batch,
                                 triples_from_entities_batch)
    from ..stages.scorecard import (finalize_scorecard, merge_partials_group,
                                    scorecard_partials_batch)

    stats = {}

    # 1. delta message boundary (the ONLY tagging pass) — appended as a new
    #    partition directory; previous message shards untouched
    delta_msg_dir = f"{prev_out}/messages/delta_{delta_name}"
    (delta_corpus.map_batches(fused_entities_batch, batch_format="pyarrow",
                              batch_size=DEFAULT_BATCH)
     .select_columns(ENTITY_COLS)
     .write_parquet(delta_msg_dir))
    stats["delta_messages"] = rd.read_parquet(delta_msg_dir).count()

    # 2. delta triples — appended alongside the previous triples partitions
    delta_tri_dir = f"{prev_out}/triples_deltas/{delta_name}"
    delta_triples = rd.read_parquet(delta_msg_dir).map_batches(
        triples_from_entities_batch, batch_format="pyarrow",
        batch_size=DEFAULT_BATCH)
    delta_triples.write_parquet(delta_tri_dir)
    stats["delta_triples"] = rd.read_parquet(delta_tri_dir).count()
    delta_triples_stored = rd.read_parquet(delta_tri_dir)

    # 3. merge aggregate views (vocabulary-sized rewrites)
    prev_nodes = rd.read_parquet(f"{prev_out}/nodes")
    prev_edges = rd.read_parquet(f"{prev_out}/edges")

    # vendor nodes: distinct union of previous vendor nodes + delta vendors
    prev_vendors = prev_nodes.map_batches(
        lambda b: b.filter(pc.equal(b["node_type"], "vendor")),
        batch_format="pyarrow")
    new_vendors = vendor_nodes(delta_corpus)
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

    nodes = vendors.union(
        _merged_entity_nodes(prev_nodes, delta_triples_stored)).materialize()
    edges = _merged_edges(prev_edges, delta_triples_stored).materialize()

    for name, ds in (("nodes", nodes), ("edges", edges)):
        tmp = f"{prev_out}/{name}.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        shutil.rmtree(f"{prev_out}/{name}")
        os.rename(tmp, f"{prev_out}/{name}")
        stats[name] = ds.count()

    # 4. scorecard from ALL stored message boundaries (content-free, small;
    #    no re-tagging)
    merged = (rd.read_parquet(f"{prev_out}/messages")
              .map_batches(scorecard_partials_batch, batch_format="pyarrow")
              .materialize()
              .groupby("repo").map_groups(merge_partials_group,
                                          batch_format="pandas"))
    sc = finalize_scorecard(merged.to_pandas())
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(sc, preserve_index=False),
                   f"{prev_out}/scorecard/scorecard.parquet")
    stats["scorecard"] = len(sc)
    return stats
