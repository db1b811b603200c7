"""The flagship pipeline: corpus → normalize → tag → triples → KG + scorecard.

Dataflow (lazy, streaming, fused — reproduces reference nb 03 Ray-Data-first):

    corpus (repo,path,commit,lang,content,views,message_date)
      ├─ fused_triples_batch  → (message_id, subj, pred, obj, obj_norm,
      │                          price_value, content_sha256)   [one-pass kernel]
      │     └─ graph_from_triples → canonical nodes + edges (one shared scan)
      └─ fused_scorecard_partials_batch → vendor scorecard     [one-pass kernel]

``build_kg`` is the checkpointed product path: it tags ONCE into a compact
entities boundary (no content column) and derives triples / canonicalization /
scorecard from stored stage boundaries.  The staged stages (enrich_batch →
tag_batch → triples_batch/entities_batch) remain the composable, inspectable
path and the semantic reference the fused kernels are differential-tested
against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.corpus import corpus_from_documents
from ..stages.enrich import (enrich_batch, fused_entities_batch,
                             fused_triples_batch, tag_batch)
from ..stages.canonicalize import (canonical_edges, canonical_entities,
                                   graph_from_triples, vendor_nodes)
from ..stages.joins import auto_partitions

DEFAULT_BATCH = 8192


def corpus_ds(sf_dir: str):
    return corpus_from_documents(sf_dir)


def tagged_messages(sf_dir: str):
    """Corpus with normalization + tokens + BIO tags attached."""
    return (
        corpus_ds(sf_dir)
        .map_batches(enrich_batch, batch_format="pyarrow", batch_size=DEFAULT_BATCH)
        .map_batches(tag_batch, batch_format="pyarrow", batch_size=DEFAULT_BATCH)
    )


def messages_with_entities(sf_dir: str):
    """Messages + entity list columns via the fused one-pass kernel (same
    output as enrich→tag→entities minus the intermediate text/token columns;
    differential-tested in tests/test_stages.py)."""
    return corpus_ds(sf_dir).map_batches(
        fused_entities_batch, batch_format="pyarrow", batch_size=DEFAULT_BATCH)


def triples_ds(sf_dir: str):
    """Corpus → triples via the fused one-pass kernel (see stages.enrich:
    fused_triples_batch — ~35% faster and near-perfectly core-scalable vs the
    staged chain because it skips the discarded intermediate list columns)."""
    return corpus_ds(sf_dir).map_batches(
        fused_triples_batch, batch_format="pyarrow", batch_size=DEFAULT_BATCH)


def vendor_scorecard(sf_dir: str):
    from ..stages.scorecard import scorecard_from_corpus

    return scorecard_from_corpus(corpus_ds(sf_dir))


# -- shared tag-pass boundary (VERDICT r3 #1) --------------------------------
# The fused normalize→tag→triples kernel is the single most expensive stage;
# every KG query (nodes, edges, pagerank, hits, ppr, communities, degrees,
# link prediction) derives from the SAME materialized triples boundary, the
# way the product path (build_kg) already does — instead of re-tagging the
# corpus per query.  Keyed by (Ray job, sf_dir) so a stale session's object
# refs are never reused.

_TRIPLES_CACHE: dict = {}
_GRAPH_CACHE: dict = {}
_COOC_CACHE: dict = {}


def _session_key(sf_dir: str):
    import ray

    return (ray.get_runtime_context().get_job_id(), sf_dir)


def triples_materialized(sf_dir: str):
    """The tag pass executed ONCE per (Ray session, sf_dir): the shared
    materialized triples boundary every derived KG query reads."""
    import ray

    ds = triples_ds(sf_dir)
    if not ray.is_initialized():
        mat = ds.materialize()  # Ray auto-initializes here
        _TRIPLES_CACHE[_session_key(sf_dir)] = mat
        return mat
    key = _session_key(sf_dir)
    if key not in _TRIPLES_CACHE:
        _TRIPLES_CACHE[key] = ds.materialize()
    return _TRIPLES_CACHE[key]


def kg_graph(sf_dir: str):
    """(nodes, edges) built from ONE tag pass + ONE triples scan via
    ``graph_from_triples`` (the build_kg shape), memoized per session —
    both outputs are vocabulary-sized, so materializing them makes every
    downstream graph query start from tiny in-memory tables."""
    triples = triples_materialized(sf_dir)
    key = _session_key(sf_dir)
    if key not in _GRAPH_CACHE:
        entity_nodes, edges = graph_from_triples(triples)
        nodes = vendor_nodes(corpus_ds(sf_dir)).union(entity_nodes)
        _GRAPH_CACHE[key] = (nodes.materialize(), edges.materialize())
    return _GRAPH_CACHE[key]


def kg_nodes(sf_dir: str):
    return kg_graph(sf_dir)[0]


def kg_edges(sf_dir: str):
    return kg_graph(sf_dir)[1]


def kg_degrees(sf_dir: str):
    """Graph-analytics over the built KG: per-node degree + mention weight.

    ONE scan of the (vocabulary-sized) edge table emits each edge twice —
    once for its vendor endpoint, once for its entity endpoint — and a
    single ``groupby(node_id)`` folds degrees with native algebraic
    aggregates.  A node only ever appears on one side (the KG is bipartite
    vendor→entity), so node_type rides along as a group constant.  No
    second edge scan, no join; the shuffle payload is the edge list itself,
    which is |vendors| × |entities|-bounded, not corpus-sized."""
    import ray.data  # noqa: F401  (Dataset ops)
    from ray.data.aggregate import Count, Sum

    def explode_endpoints(b: pa.Table) -> pa.Table:
        src = b["src_id"].combine_chunks() if isinstance(
            b["src_id"], pa.ChunkedArray) else b["src_id"]
        dst = b["dst_id"].combine_chunks() if isinstance(
            b["dst_id"], pa.ChunkedArray) else b["dst_id"]
        w = b["weight"].combine_chunks() if isinstance(
            b["weight"], pa.ChunkedArray) else b["weight"]
        n = b.num_rows
        return pa.table({
            "node_id": pa.concat_arrays([src, dst]),
            "node_type": pa.concat_arrays(
                [pa.array(["vendor"] * n, pa.string()),
                 pa.array(["entity"] * n, pa.string())]),
            "weight": pa.concat_arrays([w, w]),
        })

    return (kg_edges(sf_dir)
            .map_batches(explode_endpoints, batch_format="pyarrow")
            .groupby(["node_id", "node_type"])
            .aggregate(Count(alias_name="degree"),
                       Sum("weight", alias_name="total_weight")))


def kg_cooccurrence(sf_dir: str):
    """Entity co-mention edges: unordered pairs of DISTINCT canonical
    mentions (pred, obj_norm) appearing in the SAME message, with the number
    of messages that pair them — the association signal KG builders use to
    link entities beyond the vendor→entity bipartite edges (e.g. product ⋈
    location co-listings).

    Scale shape (ADVICE r4 #1): derives from the SHARED memoized
    ``triples_materialized`` boundary — no second corpus tag pass — and the
    pair table itself is memoized, so kg_components / kg_closeness /
    kg_truss all read one cached vocabulary²-bounded table.  Pair
    generation happens INSIDE map_batches, vectorized as a pandas
    self-merge per block with per-block pre-aggregation; the groupby that
    follows shuffles only DISTINCT pair keys, never corpus-sized data.

    Partitioning assumption (documented per the co-location contract): a
    message's triples never straddle a block boundary, because
    ``fused_triples_batch`` emits every triple of a message inside ONE
    output table (~25 K narrow rows per 8192-message batch, a few MB —
    far below ``target_max_block_size``, so Ray never splits it) and
    ``materialize()`` preserves those blocks.  The sf0.001/sf0.01 SQL
    oracle gate recomputes pairs from scratch and would catch any split.

    Pair order is canonical: key(pred, obj_norm) = ``pred + ':' + obj_norm``
    compared as code points (== DuckDB byte-wise UTF-8 compare)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    # materialize the shared boundary FIRST: it auto-initializes Ray, and
    # _session_key's get_job_id() asserts on an uninitialized session (a
    # fresh process calling kg_cooccurrence/kg_components directly would
    # otherwise crash before any Dataset op could init Ray)
    triples = triples_materialized(sf_dir)
    key = _session_key(sf_dir)
    if key in _COOC_CACHE:
        return _COOC_CACHE[key]

    def pair_partials(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "pred_a": pa.array([], pa.string()),
            "obj_a": pa.array([], pa.string()),
            "pred_b": pa.array([], pa.string()),
            "obj_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        m = b.to_pandas().drop_duplicates()   # distinct mentions per message
        m["key"] = m["pred"] + ":" + m["obj_norm"]
        j = m.merge(m, on="message_id")    # within-message cross product
        j = j[j["key_x"] < j["key_y"]]     # unordered pairs, canonical order
        if j.empty:
            return empty
        g = (j.groupby(["pred_x", "obj_norm_x", "pred_y", "obj_norm_y"])
             .size().reset_index(name="n"))
        return pa.table({
            "pred_a": pa.array(g["pred_x"], pa.string()),
            "obj_a": pa.array(g["obj_norm_x"], pa.string()),
            "pred_b": pa.array(g["pred_y"], pa.string()),
            "obj_b": pa.array(g["obj_norm_y"], pa.string()),
            "n": pa.array(g["n"], pa.int64())})

    cooc = (triples
            .select_columns(["message_id", "pred", "obj_norm"])
            .map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["pred_a", "obj_a", "pred_b", "obj_b"])
            .aggregate(Sum("n", alias_name="n_messages"))
            .materialize())
    _COOC_CACHE[key] = cooc
    return cooc


def kg_pagerank(sf_dir: str, *, damping: float = 0.85, n_iter: int = 5,
                num_partitions: int | None = None):
    """Weighted PageRank over the (symmetrized) KG — the second distributed
    ITERATIVE graph algorithm next to dedup.connected_components, and the
    standard entity-importance signal KG consumers rank by.

    Shape: the bipartite vendor→entity edges are symmetrized (undirected
    random walk), per-node out-weight and the static ``share = w / wout``
    edge table are computed ONCE (one groupby + one hash join), then each of
    the ``n_iter`` power-iteration steps is
    ``shares ⋈ ranks on u → contrib = share·r → groupby v sum → damp``
    — a hash join + a groupby, both keyed on node id, shuffling only the
    vocabulary-sized edge/rank tables (|vendors| × |entities| bounded, NEVER
    corpus-sized).  Ranks are materialized per iteration (a tiny table; the
    alternative is an n_iter-deep lazy lineage re-executing every prior
    step).  After symmetrization every node has in- AND out-edges, so there
    is no dangling-mass term.  Output rounds to 6 decimals — float sum
    order differs between the engine's shuffle and any sequential oracle
    only at ~1e-15 relative."""
    from ray.data.aggregate import Sum

    nparts = auto_partitions(num_partitions)
    e = kg_edges(sf_dir).select_columns(["src_id", "dst_id", "weight"])

    def sym(b: pa.Table) -> pa.Table:
        def chunked(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        src, dst = chunked(b["src_id"]), chunked(b["dst_id"])
        w = pc.cast(chunked(b["weight"]), pa.float64())
        return pa.table({
            "u": pa.concat_arrays([src, dst]),
            "v": pa.concat_arrays([dst, src]),
            "w": pa.concat_arrays([w, w])})

    sym_ds = e.map_batches(sym, batch_format="pyarrow")
    wout = sym_ds.groupby("u").aggregate(Sum("w", alias_name="wout"))

    def to_share(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": b["u"], "v": b["v"],
            "share": pc.divide(b["w"], b["wout"])})

    shares = (sym_ds.join(wout, join_type="inner", num_partitions=nparts,
                          on=("u",))
              .map_batches(to_share, batch_format="pyarrow")
              .materialize())
    n = wout.count()

    def init_rank(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["u"],
                         "r": pa.array([1.0 / n] * b.num_rows, pa.float64())})

    ranks = wout.map_batches(init_rank, batch_format="pyarrow").materialize()
    base = (1.0 - damping) / n

    for _ in range(n_iter):
        def contrib(b: pa.Table) -> pa.Table:
            return pa.table({"v": b["v"],
                             "c": pc.multiply(b["share"], b["r"])})

        def damp(b: pa.Table) -> pa.Table:
            return pa.table({
                "u": b["v"],
                "r": pc.add(pa.scalar(base),
                            pc.multiply(pa.scalar(damping), b["c_sum"]))})

        ranks = (shares.join(ranks, join_type="inner", num_partitions=nparts,
                             on=("u",))
                 .map_batches(contrib, batch_format="pyarrow")
                 .groupby("v").aggregate(Sum("c", alias_name="c_sum"))
                 .map_batches(damp, batch_format="pyarrow")
                 .materialize())

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node_id": b["u"],
                         "pagerank": pc.round(b["r"], ndigits=6)})

    return ranks.map_batches(finish, batch_format="pyarrow")




def kg_edge_churn(sf_dir: str, *, split_date: str = "2024-07-01"):
    """Temporal KG diff: edge churn between the corpus halves before and
    after ``split_date`` — added / removed / retained edges with weight
    deltas, the audit a daily KG maintainer reads ("which vendor-entity
    relations appeared this period").

    Shape: the two halves run the same fused-triples → canonical-edges
    path on FILTERED corpus scans (predicate pushed into the streaming
    pass, no extra materialization); the diff is a tagged UNION + one
    (src,dst)-keyed groupby with per-side Sum — no outer join operator
    needed, and the exchange is edge-vocabulary sized."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    from ..stages.canonicalize import canonical_edges

    split = _dt.date.fromisoformat(split_date)

    def half(before: bool):
        def keep(b: pa.Table) -> pa.Table:
            m = pc.less(b["message_date"], pa.scalar(split))
            return b.filter(m if before else pc.invert(m))

        filtered = corpus_ds(sf_dir).map_batches(keep,
                                                 batch_format="pyarrow")
        triples = filtered.map_batches(fused_triples_batch,
                                       batch_format="pyarrow",
                                       batch_size=DEFAULT_BATCH)
        return canonical_edges(triples)

    def tag(early: bool):
        def f(b: pa.Table) -> pa.Table:
            w = pc.cast(b["weight"], pa.int64())
            zero = pa.array([0] * b.num_rows, pa.int64())
            return pa.table({
                "src_id": b["src_id"], "dst_id": b["dst_id"],
                "w_early": w if early else zero,
                "w_late": zero if early else w,
            })
        return f

    both = (half(True).map_batches(tag(True), batch_format="pyarrow")
            .union(half(False).map_batches(tag(False),
                                           batch_format="pyarrow")))
    merged = (both.groupby(["src_id", "dst_id"])
              .aggregate(Sum("w_early", alias_name="w_early"),
                         Sum("w_late", alias_name="w_late")))

    def classify(b: pa.Table) -> pa.Table:
        e = b["w_early"]
        l = b["w_late"]
        status = pc.if_else(
            pc.equal(e, pa.scalar(0)), pa.scalar("added"),
            pc.if_else(pc.equal(l, pa.scalar(0)), pa.scalar("removed"),
                       pa.scalar("retained")))
        return pa.table({
            "src_id": b["src_id"], "dst_id": b["dst_id"],
            "w_early": e, "w_late": l,
            "delta": pc.subtract(l, e),
            "status": status,
        })

    return merged.map_batches(classify, batch_format="pyarrow")

def kg_ppr(sf_dir: str, *, seed_vendor: str = "vendor_000",
           damping: float = 0.85, n_iter: int = 5,
           num_partitions: int | None = None):
    """Personalized PageRank from one seed vendor — "entities related to
    THIS vendor" as a random walk with restart, the standard KG
    recommendation signal (vs kg_pagerank's global importance).

    Identical per-step shape to kg_pagerank (shares ⋈ ranks → groupby sum
    → damp), with two changes: rank starts as the seed indicator (the
    ranks table stays SPARSE — only touched nodes ever materialize), and
    the (1−d) teleport mass returns to the seed alone.  Assumes the seed
    has edges (every vendor does after symmetrization).

    Output: (node_id, ppr) rounded to 6dp, touched nodes only."""
    from ray.data.aggregate import Sum

    from ..stages.canonicalize import node_id

    seed = node_id("vendor", seed_vendor)
    nparts = auto_partitions(num_partitions)
    e = kg_edges(sf_dir).select_columns(["src_id", "dst_id", "weight"])

    def sym(b: pa.Table) -> pa.Table:
        def chunked(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        src, dst = chunked(b["src_id"]), chunked(b["dst_id"])
        w = pc.cast(chunked(b["weight"]), pa.float64())
        return pa.table({
            "u": pa.concat_arrays([src, dst]),
            "v": pa.concat_arrays([dst, src]),
            "w": pa.concat_arrays([w, w])})

    sym_ds = e.map_batches(sym, batch_format="pyarrow")
    wout = sym_ds.groupby("u").aggregate(Sum("w", alias_name="wout"))

    def to_share(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": b["u"], "v": b["v"],
            "share": pc.divide(b["w"], b["wout"])})

    shares = (sym_ds.join(wout, join_type="inner", num_partitions=nparts,
                          on=("u",))
              .map_batches(to_share, batch_format="pyarrow")
              .materialize())

    def init_rank(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["u"], pa.scalar(seed)))
        return pa.table({
            "u": keep["u"],
            "r": pa.array([1.0] * keep.num_rows, pa.float64())})

    ranks = wout.map_batches(init_rank, batch_format="pyarrow").materialize()

    # the seed must be present in EVERY step's aggregation even when no
    # neighbor carried mass in the previous step (e.g. iteration 1 on a
    # bipartite graph) — otherwise its (1−d) teleport mass is silently
    # dropped by the sparse join.  A constant zero-contribution seed row
    # unioned into the contributions guarantees the teleport lands.
    import ray.data as rd

    seed_row = rd.from_items([{"v": seed, "c": 0.0}])

    for _ in range(n_iter):
        def contrib(b: pa.Table) -> pa.Table:
            return pa.table({"v": b["v"],
                             "c": pc.multiply(b["share"], b["r"])})

        def damp(b: pa.Table) -> pa.Table:
            tele = pc.if_else(pc.equal(b["v"], pa.scalar(seed)),
                              pa.scalar(1.0 - damping), pa.scalar(0.0))
            return pa.table({
                "u": b["v"],
                "r": pc.add(tele,
                            pc.multiply(pa.scalar(damping), b["c_sum"]))})

        ranks = (shares.join(ranks, join_type="inner", num_partitions=nparts,
                             on=("u",))
                 .map_batches(contrib, batch_format="pyarrow")
                 .union(seed_row)
                 .groupby("v").aggregate(Sum("c", alias_name="c_sum"))
                 .map_batches(damp, batch_format="pyarrow")
                 .materialize())

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node_id": b["u"],
                         "ppr": pc.round(b["r"], ndigits=6)})

    return ranks.map_batches(finish, batch_format="pyarrow")

def kg_hits(sf_dir: str, *, n_iter: int = 3,
            num_partitions: int | None = None):
    """HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    vendor→entity KG — the companion importance signal to kg_pagerank:
    on the bipartite graph, hub scores rank vendors by how strongly they
    point at important entities, authority scores rank entities by how
    strongly important vendors point at them.

    Shape per half-iteration: ``edges ⋈ scores → weighted contrib →
    groupby other-endpoint sum → L1 normalize`` — one hash join plus one
    groupby on the vocabulary-sized edge table, exactly kg_pagerank's
    per-step cost; the L1 norm is a scalar ``ds.sum()``.  Scores
    materialize per step (tiny tables), output rounds to 6 decimals for
    float merge-order immunity.

    Returns (node_id, kind, score): kind ∈ {hub, authority}.
    """
    from ray.data.aggregate import Sum

    nparts = auto_partitions(num_partitions)
    e = (kg_edges(sf_dir).select_columns(["src_id", "dst_id", "weight"])
         .map_batches(
             lambda b: pa.table({
                 "u": b["src_id"], "v": b["dst_id"],
                 "w": pc.cast(b["weight"], pa.float64())}),
             batch_format="pyarrow")
         .materialize())

    hubs = (e.groupby("u").aggregate(Sum("w", alias_name="_"))
            .select_columns(["u"]).materialize())
    n_u = hubs.count()
    h = hubs.map_batches(
        lambda b: pa.table({"u": b["u"],
                            "h": pa.array([1.0 / n_u] * b.num_rows,
                                          pa.float64())}),
        batch_format="pyarrow").materialize()

    a = None
    for _ in range(n_iter):
        raw_a = (e.join(h, join_type="inner", num_partitions=nparts, on=("u",))
                 .map_batches(
                     lambda b: pa.table({"v": b["v"],
                                         "s": pc.multiply(b["w"], b["h"])}),
                     batch_format="pyarrow")
                 .groupby("v").aggregate(Sum("s", alias_name="s"))
                 .materialize())
        norm = raw_a.sum("s")
        a = raw_a.map_batches(
            lambda b, _n=norm: pa.table(
                {"v": b["v"], "a": pc.divide(b["s"], pa.scalar(_n))}),
            batch_format="pyarrow").materialize()
        raw_h = (e.join(a, join_type="inner", num_partitions=nparts, on=("v",))
                 .map_batches(
                     lambda b: pa.table({"u": b["u"],
                                         "s": pc.multiply(b["w"], b["a"])}),
                     batch_format="pyarrow")
                 .groupby("u").aggregate(Sum("s", alias_name="s"))
                 .materialize())
        norm = raw_h.sum("s")
        h = raw_h.map_batches(
            lambda b, _n=norm: pa.table(
                {"u": b["u"], "h": pc.divide(b["s"], pa.scalar(_n))}),
            batch_format="pyarrow").materialize()

    hub_rows = h.map_batches(
        lambda b: pa.table({
            "node_id": b["u"],
            "kind": pa.array(["hub"] * b.num_rows, pa.string()),
            "score": pc.round(b["h"], ndigits=6)}),
        batch_format="pyarrow")
    auth_rows = a.map_batches(
        lambda b: pa.table({
            "node_id": b["v"],
            "kind": pa.array(["authority"] * b.num_rows, pa.string()),
            "score": pc.round(b["a"], ndigits=6)}),
        batch_format="pyarrow")
    return hub_rows.union(auth_rows)


ENTITY_COLS = ["message_id", "repo", "views", "message_date",
               "content_sha256", "products", "prices", "locations",
               "contact_info", "all_numerical_prices"]


def build_kg(sf_dir: str, out_dir: str) -> dict:
    """Materialize the knowledge graph: partitioned Parquet triples/nodes/edges
    + vendor scorecard, with a per-run manifest (lineage + metrics).

    The expensive normalize→tag pass runs ONCE: the per-message entities
    table (WITHOUT ``content`` — entity lists + metadata + sha only, so the
    stage boundary stays small even when content dominates the corpus) is the
    first checkpoint; triples are a cheap explode of it, canonicalization and
    the scorecard read the stored boundaries.  Resumability is provided by
    state.checkpoint.checkpointed_write (skip-if-manifest-complete).
    """
    from ..state.checkpoint import _input_fingerprint

    return build_kg_from_corpus(lambda: corpus_ds(sf_dir), out_dir,
                                fingerprint=_input_fingerprint(sf_dir),
                                input_label=sf_dir)


def build_kg_from_corpus(corpus_factory, out_dir: str, *,
                         fingerprint: str, input_label: str = "") -> dict:
    """build_kg over an arbitrary corpus Dataset factory (called once per
    consuming stage) — the entry point incremental maintenance shares."""
    from ..state.checkpoint import checkpointed_write, write_manifest

    import glob
    import os

    import ray.data as rd

    # refuse to resume over an output that has incremental deltas merged in:
    # the base-input fingerprints still match for messages/triples (their
    # manifests are intact), but nodes/edges would be rebuilt from the BASE
    # triples only, silently discarding every merged delta (ADVICE r2)
    if (glob.glob(f"{out_dir}/messages/delta_*")
            or os.path.exists(f"{out_dir}/triples_deltas")):
        raise ValueError(
            f"build_kg: {out_dir} has incremental deltas applied "
            f"(messages/delta_* / triples_deltas present) — a full rebuild "
            f"here would silently drop them from nodes/edges; use a fresh "
            f"out_dir, or keep maintaining this one with incremental_update")

    from ..stages.canonicalize import vendor_nodes as v_nodes
    from ..stages.enrich import triples_from_entities_batch
    from ..stages.scorecard import (finalize_scorecard, merge_partials_group,
                                    scorecard_partials_batch)

    fp = fingerprint
    sf_dir = input_label
    stats = {}

    stats["messages"] = checkpointed_write(
        corpus_factory().map_batches(
            fused_entities_batch, batch_format="pyarrow",
            batch_size=DEFAULT_BATCH).select_columns(ENTITY_COLS),
        f"{out_dir}/messages", fingerprint=fp)

    def stored_messages():
        return rd.read_parquet(f"{out_dir}/messages")

    stats["triples"] = checkpointed_write(
        stored_messages().map_batches(triples_from_entities_batch,
                                      batch_format="pyarrow",
                                      batch_size=DEFAULT_BATCH),
        f"{out_dir}/triples", partition_on="pred", fingerprint=fp)

    # one scan of the stored triples feeds BOTH canonical node and edge merges
    from ..stages.canonicalize import graph_from_triples

    entity_nodes, edges = graph_from_triples(
        rd.read_parquet(f"{out_dir}/triples"))
    # vendor nodes from the STORED messages boundary (column-pruned `repo`
    # scan) — not a second pass over the raw corpus (VERDICT r2 #7); the
    # boundary has one row per message, so the distinct-repo set is identical
    stats["nodes"] = checkpointed_write(
        v_nodes(stored_messages().select_columns(["repo"])).union(entity_nodes),
        f"{out_dir}/nodes", fingerprint=fp)
    stats["edges"] = checkpointed_write(
        edges, f"{out_dir}/edges", partition_on="pred", fingerprint=fp)

    # scorecard over the stored entities table — no re-tagging
    merged = (stored_messages()
              .map_batches(scorecard_partials_batch, batch_format="pyarrow")
              .materialize()
              .groupby("repo").map_groups(merge_partials_group,
                                          batch_format="pandas"))
    sc = finalize_scorecard(merged.to_pandas())
    sc_table = pa.Table.from_pandas(sc, preserve_index=False)
    import pyarrow.parquet as pq
    import os
    os.makedirs(f"{out_dir}/scorecard", exist_ok=True)
    pq.write_table(sc_table, f"{out_dir}/scorecard/scorecard.parquet")
    stats["scorecard"] = {"rows": len(sc)}
    manifest = write_manifest(out_dir, sf_dir, stats)
    return manifest


def kg_link_prediction(sf_dir: str, *, min_common: int = 2, k: int = 50,
                       max_entity_fanout: int = 4096):
    """Link prediction over the bipartite KG: vendor pairs scored by the
    Jaccard similarity of their entity neighborhoods (common-neighbors
    family, Liben-Nowell & Kleinberg 2003) — "vendors with overlapping
    catalogs", the recommendation edge the co-mention table doesn't give.

    Shape: the (vendor, entity) incidence list is vocabulary-sized, never
    corpus-sized.  Per-vendor degrees come from one groupby and broadcast
    via ``ray.put``; candidate pairs are emitted per entity bucket
    (``groupby(entity).map_groups``), so only entities SHARED by ≥2 vendors
    generate work, and a ``max_entity_fanout`` guard raises with guidance on
    degenerate hub entities (the same posture as the dedup bucket caps —
    cap² pair explosion must be an explicit choice, not a silent OOM)."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Sum

    inc = kg_edges(sf_dir).select_columns(["subj", "dst_id"])

    deg = (inc.groupby("subj").aggregate(Count(alias_name="d")).to_pandas())
    deg_ref = ray.put(dict(zip(deg["subj"], deg["d"].astype(int))))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(g["subj"].unique())
        if len(vs) > max_entity_fanout:
            raise ValueError(
                f"entity {g['dst_id'].iloc[0]!r} is shared by {len(vs)} "
                f"vendors (> max_entity_fanout={max_entity_fanout}); "
                "raise the cap or pre-filter hub entities before link "
                "prediction")
        if len(vs) < 2:
            return pd.DataFrame({"vendor_a": [], "vendor_b": [], "n": []})
        ia, ib = np.triu_indices(len(vs), k=1)
        return pd.DataFrame({"vendor_a": vs[ia], "vendor_b": vs[ib],
                             "n": np.ones(len(ia), np.int64)})

    common = (inc.groupby("dst_id").map_groups(pairs, batch_format="pandas")
              .groupby(["vendor_a", "vendor_b"])
              .aggregate(Sum("n", alias_name="n_common"))
              .to_pandas())
    common = common[common["n_common"] >= min_common]
    degs = ray.get(deg_ref)
    da = common["vendor_a"].map(degs).to_numpy(np.float64)
    db = common["vendor_b"].map(degs).to_numpy(np.float64)
    n = common["n_common"].to_numpy(np.float64)
    common = common.assign(
        n_common=common["n_common"].astype("int64"),
        jaccard=np.floor(n / (da + db - n) * 1e6 + 0.5) / 1e6)
    return (common.sort_values(["jaccard", "vendor_a", "vendor_b"],
                               ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def kg_label_propagation(sf_dir: str, *, n_iter: int = 3,
                         num_partitions: int | None = None):
    """Community detection by SYNCHRONOUS weighted label propagation over the
    (symmetrized) KG — the deterministic LPA variant: every node
    simultaneously adopts the label with the largest incident edge-weight sum
    among its neighbors, ties broken by smallest label; ``n_iter`` fixed
    rounds.  (Reference analog: none — graph-analytics extension alongside
    kg_pagerank; see model_evaluator-style clustering ambitions in
    /root/reference/README.md.)

    Shape per iteration: edge-shares ⋈ labels on u (hash join, edge-table
    sized) → per-batch Arrow ``group_by`` combiner collapses (v, label)
    weight partials BEFORE the shuffle → one ``groupby(v)`` argmax.  Edge
    weights are integer mention counts, so vote sums are EXACT int64 —
    argmax cannot flip on float merge order.  All shuffled tables are
    vocabulary-sized (|vendors| + |entities|), never corpus-sized."""
    from ray.data.aggregate import Count  # noqa: F401  (import parity)

    nparts = auto_partitions(num_partitions)
    e = kg_edges(sf_dir).select_columns(["src_id", "dst_id", "weight"])

    def sym(b: pa.Table) -> pa.Table:
        def chunked(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        src, dst = chunked(b["src_id"]), chunked(b["dst_id"])
        w = pc.cast(chunked(b["weight"]), pa.int64())
        return pa.table({
            "u": pa.concat_arrays([src, dst]),
            "v": pa.concat_arrays([dst, src]),
            "w": pa.concat_arrays([w, w])})

    sym_ds = e.map_batches(sym, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max, Min, Sum

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["u"], "label": b["u"]})

    labels = (sym_ds.groupby("u").aggregate(Sum("w", alias_name="_"))
              .select_columns(["u"])
              .map_batches(init_labels, batch_format="pyarrow").materialize())

    def vote_partials(b: pa.Table) -> pa.Table:
        t = pa.table({"v": b["v"], "label": b["label"], "w": b["w"]})
        return (t.group_by(["v", "label"])
                .aggregate([("w", "sum")])
                .rename_columns(["v", "label", "ws"]))

    def keep_best(b: pa.Table) -> pa.Table:
        # winners = rows whose vote sum equals the node's max
        return (b.filter(pc.equal(b["ws"], b["best_ws"]))
                .select(["v", "label"]))

    for _ in range(n_iter):
        # exact integer vote table (v, label, ws): per-batch Arrow combiner
        # then ONE native grouped sum — no per-group Python frames anywhere
        votes = (sym_ds.join(labels, join_type="inner",
                             num_partitions=nparts, on=("u",))
                 .map_batches(vote_partials, batch_format="pyarrow")
                 .groupby(["v", "label"]).aggregate(Sum("ws", alias_name="ws"))
                 .materialize())
        # argmax by (ws desc, label asc) as native aggregates: per-node Max
        # vote, reduce-side lookup join to keep the winning rows, then Min
        # label as the deterministic tie-break (all tables vocabulary-sized)
        best = votes.groupby("v").aggregate(Max("ws", alias_name="best_ws"))
        labels = (votes.join(best, join_type="inner",
                             num_partitions=nparts, on=("v",))
                  .map_batches(keep_best, batch_format="pyarrow")
                  .groupby("v").aggregate(Min("label", alias_name="label"))
                  .map_batches(
                      lambda b: pa.table({"u": b["v"], "label": b["label"]}),
                      batch_format="pyarrow")
                  .materialize())

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node_id": b["u"], "community": b["label"]})

    pdf = (labels.map_batches(finish, batch_format="pyarrow")
           .to_pandas())
    return pdf.sort_values("node_id").reset_index(drop=True)


def kg_random_walks(sf_dir: str, *, walks_per_node: int = 2,
                    walk_len: int = 3, num_partitions: int | None = None):
    """DeepWalk-style random-walk corpus over the (symmetrized) KG
    (Perozzi et al., KDD 2014) — the sequence-generation pass graph-
    embedding training consumes ("sentences" of node ids for a skip-gram
    model).  Deterministic: at step ``s`` walk ``w`` moves to the neighbor
    ``v`` minimizing ``md5_u64(walk_id:s:v)`` — an argmin-hash uniform
    choice that needs NO per-node neighbor ranks, so each step is ONE hash
    join (state ⋈ edges on the current node) plus ONE native Min groupby
    over a fixed-width ``(hash, v)`` string pack; ties (md5 collisions)
    break by v asc.  No per-group Python anywhere; all shuffled tables are
    (walks × avg-degree)-bounded, never corpus-sized.  The md5 keying is a
    Python loop over the joined rows — acceptable because the joined table
    is vocabulary-sized (same posture as hash_sample).

    Output: (walk_id, step, node_id) for steps 0..walk_len, sorted
    (walk_id asc, step asc); walk_id = start-node id + '#' + walk index.
    """
    from ray.data.aggregate import Min, Sum

    from ..stages.dedup import _stable_u64

    nparts = auto_partitions(num_partitions)
    e = kg_edges(sf_dir).select_columns(["src_id", "dst_id"])

    def sym(b: pa.Table) -> pa.Table:
        def chunked(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        src, dst = chunked(b["src_id"]), chunked(b["dst_id"])
        t = pa.table({"u": pa.concat_arrays([src, dst]),
                      "v": pa.concat_arrays([dst, src])})
        return t.group_by(["u", "v"]).aggregate([]) \
            .rename_columns(["u", "v"])              # per-batch distinct

    from ray.data.aggregate import Count

    sym_ds = (e.map_batches(sym, batch_format="pyarrow")
              .groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
              .select_columns(["u", "v"]).materialize())

    def init_walks(b: pa.Table) -> pa.Table:
        us = b["u"].to_pylist()
        wids = [f"{u}#{w}" for u in us for w in range(walks_per_node)]
        curs = [u for u in us for _ in range(walks_per_node)]
        return pa.table({"walk_id": pa.array(wids, pa.string()),
                         "u": pa.array(curs, pa.string())})

    state = (sym_ds.groupby("u").aggregate(Count(alias_name="_n"))
             .select_columns(["u"])
             .map_batches(init_walks, batch_format="pyarrow").materialize())

    def trace_rows(step):
        def kernel(b: pa.Table) -> pa.Table:
            return pa.table({
                "walk_id": b["walk_id"],
                "step": pa.array([step] * b.num_rows, pa.int64()),
                "node_id": b["u"]})
        return kernel

    traces = [state.map_batches(trace_rows(0), batch_format="pyarrow")
              .materialize()]

    for s in range(1, walk_len + 1):
        def pack_key(b: pa.Table, _s=s) -> pa.Table:
            # md5 keying stays a Python loop (no vectorized md5 kernel
            # exists; the SQL oracle mirrors md5 exactly), but the ordered
            # pack itself is built with Arrow kernels: zero-padded hash ++
            # "|" ++ v, fixed offset — no per-row f-string
            wids = b["walk_id"].to_pylist()
            vs = b["v"].to_pylist()
            h = np.fromiter(
                (_stable_u64(f"{w}:{_s}:{v}") for w, v in zip(wids, vs)),
                dtype=np.uint64, count=len(wids))
            hstr = pc.utf8_lpad(pa.array(h.astype("U20")), 20, "0")
            v_arr = b["v"].combine_chunks() if isinstance(
                b["v"], pa.ChunkedArray) else b["v"]
            return pa.table({
                "walk_id": b["walk_id"],
                "pack": pc.binary_join_element_wise(hstr, v_arr, "|")})

        def unpack(b: pa.Table) -> pa.Table:
            # hash pack is fixed-width (20 digits + "|") → Arrow slice,
            # no per-row split
            return pa.table({
                "walk_id": b["walk_id"],
                "u": pc.utf8_slice_codeunits(
                    b["pack"].combine_chunks() if isinstance(
                        b["pack"], pa.ChunkedArray) else b["pack"],
                    start=21, stop=2 ** 30)})

        state = (sym_ds.join(state, join_type="inner",
                             num_partitions=nparts, on=("u",))
                 .map_batches(pack_key, batch_format="pyarrow")
                 .groupby("walk_id").aggregate(Min("pack", alias_name="pack"))
                 .map_batches(unpack, batch_format="pyarrow")
                 .materialize())
        traces.append(state.map_batches(trace_rows(s),
                                        batch_format="pyarrow").materialize())

    out = traces[0]
    for t in traces[1:]:
        out = out.union(t)
    return (out.to_pandas()
            .sort_values(["walk_id", "step"]).reset_index(drop=True))


def kg_walk_skipgrams(sf_dir: str, *, walks_per_node: int = 2,
                      walk_len: int = 3, window: int = 2,
                      num_partitions: int | None = None):
    """Skip-gram (center, context) pair counts from the KG random-walk
    corpus — the training table a node-embedding skip-gram model consumes
    (word2vec over walks, Perozzi et al. 2014 / Grover & Leskovec 2016).

    Shape: the walk trace is self-joined on walk_id (ONE hash join — walk
    rows need no co-location assumption, unlike a per-walk map_groups) and
    filtered to 0 < |step_a − step_b| ≤ window, then pair counts fold
    through a per-batch Arrow combiner + native Sum groupby.  All tables
    are (walks × walk_len)-bounded.  Output: (center, context, n_pairs),
    sorted (center, context)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    nparts = auto_partitions(num_partitions)
    walks = kg_random_walks(sf_dir, walks_per_node=walks_per_node,
                            walk_len=walk_len,
                            num_partitions=num_partitions)
    walks_ds = rd.from_pandas(walks).map_batches(
        lambda b: b, batch_format="pyarrow")

    other = walks_ds.map_batches(
        lambda b: pa.table({"walk_id": b["walk_id"],
                            "step_b": b["step"],
                            "context": b["node_id"]}),
        batch_format="pyarrow")

    def pair_partials(b: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(b["step"], b["step_b"]))
        keep = pc.and_(pc.greater(d, 0), pc.less_equal(d, window))
        t = b.filter(keep).select(["node_id", "context"])
        return (t.group_by(["node_id", "context"])
                .aggregate([("context", "count")])
                .rename_columns(["center", "context", "n_pairs"]))

    pairs = (walks_ds.join(other, join_type="inner",
                           num_partitions=nparts, on=("walk_id",))
             .map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["center", "context"])
             .aggregate(Sum("n_pairs", alias_name="n_pairs")))
    return (pairs.to_pandas()
            .sort_values(["center", "context"]).reset_index(drop=True))


def kg_components(sf_dir: str, *, num_partitions: int | None = None):
    """Connected components over the entity CO-MENTION graph — the
    cluster structure of "which entities get talked about together",
    complementing kg_label_propagation's weighted communities with exact
    reachability components (what a KG consumer uses to split the graph
    into independent work units).

    Shape: pair edges come from ``kg_cooccurrence``'s combiner pass
    (distinct pair keys, vocabulary²-bounded); the node set (including
    singletons that never co-mention, via self-pairs) comes from the
    SHARED materialized triples boundary.  Node keys are 63-bit md5 ids
    (``_stable_u64 >> 1``, identical to ``md5_number_lower`` in SQL), so
    the BSP min-label + pointer-jumping components
    (``stages.dedup.connected_components``, O(log diameter) rounds with an
    exact integer convergence witness) run on int64 and the recursive-CTE
    mirror replays them bit-exactly.  Every in-flight table is
    vocabulary-sized; the final size attach happens driver-side on the
    node-count-sized membership table.

    Output: (node, cluster_id, cluster_size) sorted by node, where node =
    ``pred || ':' || obj_norm`` and cluster_id is the component's minimum
    member id."""
    from ray.data.aggregate import Count

    from ..stages.dedup import _stable_u64, connected_components
    from ..stages.joins import hash_lookup_join

    nparts = auto_partitions(num_partitions)

    def _ids(keys: list[str]) -> pa.Array:
        return pa.array([_stable_u64(k) >> 1 for k in keys], pa.int64())

    nodes = (triples_materialized(sf_dir)
             .select_columns(["pred", "obj_norm"])
             .groupby(["pred", "obj_norm"])
             .aggregate(Count(alias_name="_n"))
             .drop_columns(["_n"]))

    def add_id(b: pa.Table) -> pa.Table:
        ks = [p + ":" + o for p, o in zip(b["pred"].to_pylist(),
                                          b["obj_norm"].to_pylist())]
        return pa.table({"node": pa.array(ks, pa.string()),
                         "nid": _ids(ks)})

    nid = nodes.map_batches(add_id, batch_format="pyarrow").materialize()

    def pair_ids(b: pa.Table) -> pa.Table:
        ka = [p + ":" + o for p, o in zip(b["pred_a"].to_pylist(),
                                          b["obj_a"].to_pylist())]
        kb = [p + ":" + o for p, o in zip(b["pred_b"].to_pylist(),
                                          b["obj_b"].to_pylist())]
        return pa.table({"id_a": _ids(ka), "id_b": _ids(kb)})

    pairs = (kg_cooccurrence(sf_dir)
             .map_batches(pair_ids, batch_format="pyarrow")
             .union(nid.map_batches(
                 lambda b: pa.table({"id_a": b["nid"], "id_b": b["nid"]}),
                 batch_format="pyarrow")))
    cc = connected_components(pairs, id_a="id_a", id_b="id_b",
                              out_id_col="nid", num_partitions=nparts)

    members = hash_lookup_join(nid, cc, on="nid",
                               num_partitions=nparts).to_pandas()
    sizes = members.groupby("cluster_id")["node"].transform("size")
    members = members.assign(cluster_size=sizes.astype("int64"))
    return (members[["node", "cluster_id", "cluster_size"]]
            .sort_values("node").reset_index(drop=True))


def kg_wl_colors(sf_dir: str, *, n_rounds: int = 3,
                 num_partitions: int | None = None):
    """1-WL color refinement (Weisfeiler-Leman; Shervashidze et al. 2011)
    over the symmetrized KG: each round every node's color becomes a hash
    of (own color, SORTED multiset of neighbor colors).  After a few
    rounds equal colors ≡ equal local neighborhood trees — the structural
    node fingerprint role-mining and graph-matching pipelines start from,
    and the iterative-HASHING graph family next to PageRank (numeric),
    LPA (argmax) and k-core (peeling).

    Shape per round: neighbor colors attach by ONE reduce-side lookup
    join; own+neighbor rows co-shuffle by a hash BUCKET of the node (the
    CC/joins pattern — never one Ray group per node), and each bucket
    folds its nodes vectorized-by-group (sort + per-group string join +
    md5).  Colors are 63-bit md5 ids (``_stable_u64 >> 1``), so the
    DuckDB mirror (string_agg ORDER BY + md5_number_lower) replays every
    round bit-exactly.  All tables are vocabulary-sized.

    Output: (node_id, degree, wl_color) sorted by node_id; wl_color after
    ``n_rounds`` rounds, degree = round-0 color input."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Count

    from ..stages.dedup import _stable_u64
    from ..stages.joins import auto_partitions, hash_lookup_join

    nparts = auto_partitions(num_partitions)

    def sym(b: pa.Table) -> pa.Table:
        def chunked(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        src, dst = chunked(b["src_id"]), chunked(b["dst_id"])
        return pa.table({"u": pa.concat_arrays([src, dst]),
                         "v": pa.concat_arrays([dst, src])})

    sym_ds = (kg_edges(sf_dir).select_columns(["src_id", "dst_id"])
              .map_batches(sym, batch_format="pyarrow").materialize())

    labels = (sym_ds.groupby("u").aggregate(Count(alias_name="l"))
              .map_batches(lambda b: b, batch_format="pyarrow")
              .materialize())
    degrees = labels

    def bucket_col(b: pa.Table, col: str) -> pa.Table:
        h = pd.util.hash_array(np.asarray(b[col].to_pylist(), dtype=object))
        return b.append_column(
            "part", pa.array((h % np.uint64(nparts)).astype(np.int64)))

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["tag"] == 1]
        nb = g[g["tag"] == 0].sort_values(["u", "l"], kind="mergesort")
        joined = (nb.groupby("u", sort=False)["l"]
                  .agg(lambda s: ",".join(str(int(x)) for x in s)))
        m = own.set_index("u")["l"]
        out_u = joined.index.to_numpy()
        new = [ _stable_u64(f"{int(m[u])}|{joined[u]}") >> 1 for u in out_u ]
        return pd.DataFrame({"u": out_u, "l": np.asarray(new, np.int64)})

    for _ in range(n_rounds):
        lv = labels.map_batches(
            lambda b: pa.table({"v": b["u"], "lv": b["l"]}),
            batch_format="pyarrow")
        nb_rows = (hash_lookup_join(sym_ds, lv, on="v",
                                    num_partitions=nparts)
                   .map_batches(lambda b: pa.table(
                       {"u": b["u"], "l": b["lv"],
                        "tag": pa.array([0] * b.num_rows, pa.int8())}),
                       batch_format="pyarrow"))
        own_rows = labels.map_batches(
            lambda b: pa.table({"u": b["u"], "l": b["l"],
                                "tag": pa.array([1] * b.num_rows, pa.int8())}),
            batch_format="pyarrow")
        labels = (nb_rows.union(own_rows)
                  .map_batches(lambda b: bucket_col(b, "u"),
                               batch_format="pyarrow")
                  .groupby("part")
                  .map_groups(refine, batch_format="pandas")
                  .map_batches(lambda b: b, batch_format="pyarrow")
                  .repartition(nparts).materialize())

    out = hash_lookup_join(
        degrees.map_batches(
            lambda b: pa.table({"u": b["u"], "degree": b["l"]}),
            batch_format="pyarrow"),
        labels.map_batches(
            lambda b: pa.table({"u": b["u"], "wl_color": b["l"]}),
            batch_format="pyarrow"),
        on="u", num_partitions=nparts).to_pandas()
    out = out.rename(columns={"u": "node_id"}).astype(
        {"degree": "int64", "wl_color": "int64"})
    return (out[["node_id", "degree", "wl_color"]]
            .sort_values("node_id").reset_index(drop=True))


def kg_butterflies(sf_dir: str, *, max_entity_fanout: int = 4096,
                   num_partitions: int | None = None):
    """Per-vendor BUTTERFLY counts over the bipartite KG — the (2,2)-
    biclique / 4-cycle motif (Wang et al., "Butterfly counting in
    bipartite networks"): a butterfly is two vendors sharing two
    entities, the bipartite analog of the triangle and the densest
    cohesion signal a vendor↔entity graph has (catalog overlap
    strength).  b(u) = Σ_{u'≠u} C(|N(u) ∩ N(u')|, 2).

    Shape: the same per-entity candidate-pair generation as
    kg_link_prediction (pairs are emitted only inside an entity's vendor
    list, ``max_entity_fanout``-guarded; per-batch pre-aggregation), ONE
    native Sum groupby folds common-neighbor counts per vendor pair, the
    C(n,2) transform is vectorized, and the per-vendor rollup is one more
    explode + Sum groupby.  Every shuffled table is vendor-pair bounded
    (vocabulary², tiny in practice), never corpus-sized.

    Output: (vendor, n_butterflies) for vendors in ≥1 butterfly, sorted
    by vendor."""
    import numpy as np
    from ray.data.aggregate import Sum

    inc = kg_edges(sf_dir).select_columns(["subj", "dst_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.sort(g["subj"].unique())
        if len(vs) > max_entity_fanout:
            raise ValueError(
                f"entity {g['dst_id'].iloc[0]!r} is shared by {len(vs)} "
                f"vendors (> max_entity_fanout={max_entity_fanout}); "
                "raise the cap or pre-filter hub entities")
        if len(vs) < 2:
            return pd.DataFrame({"vendor_a": [], "vendor_b": [], "n": []})
        ia, ib = np.triu_indices(len(vs), k=1)
        return pd.DataFrame({"vendor_a": vs[ia], "vendor_b": vs[ib],
                             "n": np.ones(len(ia), np.int64)})

    common = (inc.groupby("dst_id").map_groups(pairs, batch_format="pandas")
              .groupby(["vendor_a", "vendor_b"])
              .aggregate(Sum("n", alias_name="n_common")))

    def explode_bf(b: pa.Table) -> pa.Table:
        n = b["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        bf = n * (n - 1) // 2
        keep = bf > 0
        va = b["vendor_a"].to_numpy(zero_copy_only=False)[keep]
        vb = b["vendor_b"].to_numpy(zero_copy_only=False)[keep]
        bf = bf[keep]
        return pa.table({
            "vendor": pa.array(np.concatenate([va, vb]), pa.string()),
            "bf": pa.array(np.concatenate([bf, bf]), pa.int64())})

    out = (common.map_batches(explode_bf, batch_format="pyarrow")
           .groupby("vendor").aggregate(Sum("bf",
                                            alias_name="n_butterflies"))
           .to_pandas())
    out["n_butterflies"] = out["n_butterflies"].astype("int64")
    return out.sort_values("vendor").reset_index(drop=True)


def kg_alias_edges(sf_dir: str, *, num_partitions: int | None = None):
    """KG edge canonicalization through FUZZY alias resolution — the
    north-star canonicalization step applied to the graph itself: entity
    mention keys within edit distance 1 (typos, spacing drift) collapse
    into one canonical node (most-mentioned form, ties to the smallest),
    and the edge table is rewritten onto the canonical nodes with weights
    re-aggregated.  Composes fuzzy blocking (SymSpell deletion
    neighborhoods), distributed connected components and the edge-table
    groupby — the exact-match canonicalization kg_edges already does,
    upgraded to fuzzy.

    Mention keys are ``pred || ':' || obj_norm``; predicates differ by ≥2
    edits, so an edit-distance-1 pair can never cross predicates and the
    composite key needs no per-type blocking.  All tables in flight are
    vocabulary-sized; CC runs on 63-bit md5 ids (the pandas-float
    corruption class is pinned by test_connected_components_md5_scale_ids).

    Output: (subj, node_canon, weight) sorted, weight = total mentions of
    the vendor against ANY alias in the canonical cluster."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _stable_u64, connected_components
    from ..stages.fuzzy import fuzzy_form_pairs
    from ..stages.joins import auto_partitions, hash_lookup_join

    nparts = auto_partitions(num_partitions)

    def add_key(b: pa.Table) -> pa.Table:
        ks = [p + ":" + o for p, o in zip(b["pred"].to_pylist(),
                                          b["obj_norm"].to_pylist())]
        return pa.table({"mention": pa.array(ks, pa.string())})

    mentions = (triples_materialized(sf_dir)
                .select_columns(["pred", "obj_norm"])
                .map_batches(add_key, batch_format="pyarrow"))

    from ray.data.aggregate import Count

    forms = (mentions.groupby("mention")
             .aggregate(Count(alias_name="n"))
             .map_batches(lambda b: pa.table({
                 "form": b["mention"], "n": b["n"],
                 "fid": pa.array([_stable_u64(s) >> 1
                                  for s in b["mention"].to_pylist()],
                                 pa.int64())}), batch_format="pyarrow")
             .materialize())

    pairs = fuzzy_form_pairs(mentions, col="mention")

    def pair_ids(b: pa.Table) -> pa.Table:
        a = [_stable_u64(s) >> 1 for s in b["name_a"].to_pylist()]
        c = [_stable_u64(s) >> 1 for s in b["name_b"].to_pylist()]
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(c, pa.int64())})

    all_pairs = (pairs.map_batches(pair_ids, batch_format="pyarrow")
                 .union(forms.map_batches(
                     lambda b: pa.table({"id_a": b["fid"],
                                         "id_b": b["fid"]}),
                     batch_format="pyarrow")))
    cc = connected_components(all_pairs, id_a="id_a", id_b="id_b",
                              out_id_col="fid", num_partitions=nparts)

    members = hash_lookup_join(forms, cc, on="fid",
                               num_partitions=nparts)

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "form"], ascending=[False, True])
        return pd.DataFrame({"form": g["form"],
                             "node_canon": g["form"].iloc[0]})

    resolution = (members.groupby("cluster_id")
                  .map_groups(canon, batch_format="pandas")
                  .map_batches(lambda b: b, batch_format="pyarrow"))

    edges = (kg_edges(sf_dir)
             .map_batches(lambda b: pa.table({
                 "subj": b["subj"],
                 "form": pa.array(
                     [p + ":" + o for p, o in
                      zip(b["pred"].to_pylist(),
                          b["obj_norm"].to_pylist())], pa.string()),
                 "weight": b["weight"]}), batch_format="pyarrow"))

    out = (hash_lookup_join(edges, resolution, on="form",
                            num_partitions=nparts)
           .groupby(["subj", "node_canon"])
           .aggregate(Sum("weight", alias_name="weight"))
           .to_pandas())
    out["weight"] = out["weight"].astype("int64")
    return (out.sort_values(["subj", "node_canon"])
            .reset_index(drop=True))


def kg_edge_span(sf_dir: str, *, num_partitions: int | None = None):
    """Edge PROVENANCE: for every (vendor, predicate, entity) edge, the
    first/last mention date and the mention count — the freshness /
    lineage metadata an incrementally-maintained KG serves next to the
    edge itself (is this relation current? when did it appear?).

    Shape: the (message_id, date) projection of the corpus attaches to the
    shared materialized triples boundary by ONE reduce-side lookup join on
    message_id, a per-batch Arrow ``group_by`` combiner collapses
    (edge, min-day, max-day, n) partials BEFORE the shuffle, and one
    native Min/Max/Sum groupby folds them — the shuffle carries distinct
    edge keys only.  Dates travel as int32 epoch days (native Min/Max)
    and render to strings at the end (driver-compare convention).

    Output: (subj, pred, obj_norm, first_seen, last_seen, n_mentions)
    sorted by (subj, pred, obj_norm)."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.joins import auto_partitions, hash_lookup_join

    nparts = auto_partitions(num_partitions)

    dates = corpus_ds(sf_dir).select_columns(
        ["message_id", "message_date"]).map_batches(
        lambda b: pa.table({
            "message_id": b["message_id"],
            "day": pc.cast(b["message_date"], pa.int32())}),
        batch_format="pyarrow")

    triples = triples_materialized(sf_dir).select_columns(
        ["message_id", "subj", "pred", "obj_norm"])

    joined = hash_lookup_join(triples, dates, on="message_id",
                              num_partitions=nparts)

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"subj": b["subj"], "pred": b["pred"],
                      "obj_norm": b["obj_norm"], "day": b["day"]})
        g = (t.group_by(["subj", "pred", "obj_norm"])
             .aggregate([("day", "min"), ("day", "max"),
                         ([], "count_all")]))
        return g.rename_columns(["subj", "pred", "obj_norm",
                                 "dmin", "dmax", "n"])

    agg = (joined.map_batches(partials, batch_format="pyarrow")
           .groupby(["subj", "pred", "obj_norm"])
           .aggregate(Min("dmin", alias_name="dmin"),
                      Max("dmax", alias_name="dmax"),
                      Sum("n", alias_name="n_mentions"))
           .to_pandas())

    agg["first_seen"] = pd.to_datetime(
        agg["dmin"].astype("int64"), unit="D").dt.strftime("%Y-%m-%d")
    agg["last_seen"] = pd.to_datetime(
        agg["dmax"].astype("int64"), unit="D").dt.strftime("%Y-%m-%d")
    agg["n_mentions"] = agg["n_mentions"].astype("int64")
    return (agg[["subj", "pred", "obj_norm", "first_seen", "last_seen",
                 "n_mentions"]]
            .sort_values(["subj", "pred", "obj_norm"])
            .reset_index(drop=True))


def kg_closeness(sf_dir: str, *, max_hops: int = 4, seed_mod: int = 3,
                 num_partitions: int | None = None):
    """Sampled-source HARMONIC closeness centrality (Marchiori & Latora
    2000) over the entity co-mention graph: c(v) = Σ_{s ∈ seeds, s ≠ v,
    d(s,v) ≤ max_hops} 1/d(s,v), seeds = the deterministic md5 sample
    ``md5(node) % seed_mod == 0``.  Source sampling is THE scalable
    closeness design — all-pairs BFS is quadratic in nodes; a fixed
    sample gives an unbiased estimator whose cost is |seeds| × frontier.

    Shape per hop: the (node, seed, dist) table attaches to the symmetric
    co-mention edge list by ONE reduce-side lookup join, candidates get
    dist+1, and a native Min groupby folds shortest distances; block
    count is re-bounded per round (the k-core lesson).  Scores are EXACT
    integers — Σ 12/d with d ∈ {1..4} (12 = lcm) — so no float merge
    order can flip a value; the reported ``closeness`` is c12/12 rounded
    6dp identically on both sides.

    Output: (node, n_reached, closeness) for nodes reached by ≥1 seed,
    sorted by node."""
    import numpy as np
    from ray.data.aggregate import Min

    from ..stages.dedup import _stable_u64
    from ..stages.joins import auto_partitions, hash_lookup_join

    if max_hops > 4:
        raise ValueError("max_hops > 4 breaks the exact 12/d integer "
                         "scoring; raise the lcm constant alongside it")
    nparts = auto_partitions(num_partitions)

    def edge_rows(b: pa.Table) -> pa.Table:
        ka = [p + ":" + o for p, o in zip(b["pred_a"].to_pylist(),
                                          b["obj_a"].to_pylist())]
        kb = [p + ":" + o for p, o in zip(b["pred_b"].to_pylist(),
                                          b["obj_b"].to_pylist())]
        return pa.table({
            "u": pa.array(ka + kb, pa.string()),
            "v": pa.array(kb + ka, pa.string())})

    sym = (kg_cooccurrence(sf_dir)
           .map_batches(edge_rows, batch_format="pyarrow").materialize())

    def seed_rows(b: pa.Table) -> pa.Table:
        us = sorted(set(b["u"].to_pylist()))
        ss = [u for u in us if _stable_u64(u) % seed_mod == 0]
        return pa.table({"node": pa.array(ss, pa.string()),
                         "seed": pa.array(ss, pa.string()),
                         "d": pa.array([0] * len(ss), pa.int64())})

    # distinct vertices → sampled seeds at distance 0
    verts = (sym.groupby("u").aggregate(Min("v", alias_name="_"))
             .drop_columns(["_"]))
    dist = (verts.map_batches(seed_rows, batch_format="pyarrow")
            .repartition(nparts).materialize())

    for _ in range(max_hops):
        cand = (hash_lookup_join(
            sym, dist.map_batches(
                lambda b: pa.table({"u": b["node"], "seed": b["seed"],
                                    "d": b["d"]}), batch_format="pyarrow"),
            on="u", num_partitions=nparts)
            .map_batches(lambda b: pa.table({
                "node": b["v"], "seed": b["seed"],
                "d": pc.add(b["d"], 1)}), batch_format="pyarrow"))
        dist = (dist.union(cand)
                .groupby(["node", "seed"])
                .aggregate(Min("d", alias_name="d"))
                .map_batches(lambda b: b, batch_format="pyarrow")
                .repartition(nparts).materialize())

    pdf = dist.to_pandas()
    pdf = pdf[pdf["d"] > 0]
    pdf["c12"] = (12 // pdf["d"]).astype("int64")
    out = (pdf.groupby("node")
           .agg(n_reached=("seed", "size"), c12=("c12", "sum"))
           .reset_index())
    out["closeness"] = np.floor(out["c12"] / 12.0 * 1e6 + 0.5) / 1e6
    out = out.astype({"n_reached": "int64"})
    return (out[["node", "n_reached", "closeness"]]
            .sort_values("node").reset_index(drop=True))


def kg_edge_pmi(sf_dir: str, *, num_partitions: int | None = None):
    """Edge ASSOCIATION strength: pointwise mutual information of each
    (vendor, entity) edge against the mention marginals —
    ``pmi = ln(n_uv · N / (n_u · n_v))`` — the statistical edge weighting
    KG consumers rank by when raw counts are dominated by prolific
    vendors (token_pmi's graph sibling).

    Shape: ONE scan of the (vocabulary-sized) edge table; marginals are
    two small groupby folds joined back reduce-side; N is one Sum fold.
    The log ratio is computed from EXACT int64 counts on both sides, so
    only the final ln/round double step exists.

    Output: (subj, pred, obj_norm, n_uv, pmi) sorted by (subj, pred,
    obj_norm); pmi rounded 6dp."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..stages.joins import auto_partitions, hash_lookup_join

    nparts = auto_partitions(num_partitions)
    edges = (kg_edges(sf_dir)
             .map_batches(lambda b: pa.table({
                 "subj": b["subj"], "pred": b["pred"],
                 "obj_norm": b["obj_norm"],
                 "ent": pa.array([p + ":" + o for p, o in
                                  zip(b["pred"].to_pylist(),
                                      b["obj_norm"].to_pylist())],
                                 pa.string()),
                 "w": pc.cast(b["weight"], pa.int64())}),
                 batch_format="pyarrow")
             .materialize())

    nu = (edges.groupby("subj").aggregate(Sum("w", alias_name="n_u"))
          .map_batches(lambda b: b, batch_format="pyarrow"))
    nv = (edges.groupby("ent").aggregate(Sum("w", alias_name="n_v"))
          .map_batches(lambda b: b, batch_format="pyarrow"))
    total = int(edges.sum("w"))

    j = hash_lookup_join(edges, nu, on="subj", num_partitions=nparts)
    j = hash_lookup_join(j, nv, on="ent", num_partitions=nparts)

    def score(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_u = b["n_u"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_v = b["n_v"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(w * float(total) / (n_u * n_v))
        pmi = np.floor(pmi * 1e6 + 0.5) / 1e6
        return pa.table({
            "subj": b["subj"], "pred": b["pred"],
            "obj_norm": b["obj_norm"],
            "n_uv": pc.cast(b["w"], pa.int64()),
            "pmi": pa.array(pmi, pa.float64())})

    out = (j.map_batches(score, batch_format="pyarrow").to_pandas())
    return (out.sort_values(["subj", "pred", "obj_norm"])
            .reset_index(drop=True))


def kg_negative_samples(sf_dir: str, *, k: int = 2,
                        num_partitions: int | None = None):
    """Deterministic NEGATIVE sampling for KG-embedding training (the
    corrupted-tail data prep of TransE, Bordes et al. 2013): for every
    positive edge (vendor, entity) emit ``k`` tail candidates drawn by
    hash from the entity vocabulary, then drop any candidate that is a
    TRUE edge of that vendor — via the distributed ANTI join, never a
    broadcast positive set (the edge table may not fit one worker at
    100 TB; only the sorted entity ARRAY ships via ``ray.put``, the
    standard KG-training assumption of an in-memory entity vocabulary).

    Candidate i for edge (s, e) is ``E[md5(s|e|i) % |E|]`` — collisions
    with positives are DROPPED, not re-drawn (rejection would be
    iterative and data-dependent; the fixed-draw-then-filter form is
    one-pass and exactly SQL-replayable).  The anti-join key uses
    the \\x1f unit separator, which cannot appear in normalized
    text, so distinct (subj, entity) pairs can never alias
    (ADVICE r4 #5).

    Output: (subj, ent_pos, sample_idx, ent_neg), sorted."""
    import numpy as np
    import ray
    from ray.data.aggregate import Count

    from ..stages.dedup import _stable_u64
    from ..stages.joins import auto_partitions, hash_anti_join

    nparts = auto_partitions(num_partitions)

    edges = (kg_edges(sf_dir)
             .map_batches(lambda b: pa.table({
                 "subj": b["subj"],
                 "ent": pa.array([p + ":" + o for p, o in
                                  zip(b["pred"].to_pylist(),
                                      b["obj_norm"].to_pylist())],
                                 pa.string())}), batch_format="pyarrow")
             .materialize())

    ents = sorted(edges.groupby("ent")
                  .aggregate(Count(alias_name="_n"))
                  .to_pandas()["ent"])
    n_ent = len(ents)
    ents_ref = ray.put(np.asarray(ents, dtype=object))

    def candidates(b: pa.Table) -> pa.Table:
        evoc = ray.get(ents_ref)
        subj = b["subj"].to_pylist()
        ent = b["ent"].to_pylist()
        out = {"subj": [], "ent_pos": [], "sample_idx": [], "key": [],
               "ent_neg": []}
        for s, e in zip(subj, ent):
            for i in range(1, k + 1):
                neg = evoc[_stable_u64(f"{s}|{e}|{i}") % n_ent]
                out["subj"].append(s)
                out["ent_pos"].append(e)
                out["sample_idx"].append(i)
                out["key"].append(s + "\x1f" + neg)
                out["ent_neg"].append(neg)
        return pa.table({
            "subj": pa.array(out["subj"], pa.string()),
            "ent_pos": pa.array(out["ent_pos"], pa.string()),
            "sample_idx": pa.array(out["sample_idx"], pa.int64()),
            "key": pa.array(out["key"], pa.string()),
            "ent_neg": pa.array(out["ent_neg"], pa.string())})

    cand = edges.map_batches(candidates, batch_format="pyarrow")
    pos_keys = edges.map_batches(
        lambda b: pa.table({"key": pa.array(
            [s + "\x1f" + e for s, e in zip(b["subj"].to_pylist(),
                                        b["ent"].to_pylist())],
            pa.string())}), batch_format="pyarrow")

    out = (hash_anti_join(cand, pos_keys, on="key",
                          num_partitions=nparts)
           .drop_columns(["key"]).to_pandas())
    out["sample_idx"] = out["sample_idx"].astype("int64")
    return (out[["subj", "ent_pos", "sample_idx", "ent_neg"]]
            .sort_values(["subj", "ent_pos", "sample_idx"])
            .reset_index(drop=True))


def kg_truss(sf_dir: str, *, k: int = 6, n_rounds: int = 5,
             max_node_fanout: int = 4096,
             num_partitions: int | None = None):
    """k-truss decomposition (Cohen 2008) of the entity co-mention graph —
    the EDGE-peeling iterative family next to k-core's node peel: each
    round drops every edge in fewer than ``k-2`` triangles, until only the
    cohesive triangle-dense backbone remains (the subgraph community
    miners trust more than raw co-mention counts).

    Shape per round: wedges are generated only inside each anchor node's
    neighbor list (``groupby(anchor).map_groups``, fanout-guarded — the
    kg_link_prediction posture), closed against the edge set by the
    string-key SEMI join, supports folded by one native Sum groupby, and
    survivors kept by a second semi-join; block count re-bounded per
    round (the k-core lesson).  Everything in flight is
    vocabulary²-bounded.  The final support column is recomputed over the
    SURVIVING edge set so the output is self-consistent.

    Output: (node_a, node_b, support) for surviving edges, sorted."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..stages.joins import (auto_partitions, hash_lookup_join,
                                hash_semi_join)

    nparts = auto_partitions(num_partitions)

    def edge_rows(b: pa.Table) -> pa.Table:
        ka = [p + ":" + o for p, o in zip(b["pred_a"].to_pylist(),
                                          b["obj_a"].to_pylist())]
        kb = [p + ":" + o for p, o in zip(b["pred_b"].to_pylist(),
                                          b["obj_b"].to_pylist())]
        return pa.table({
            "a": pa.array(ka, pa.string()), "b": pa.array(kb, pa.string()),
            "key": pa.array([x + "|" + y for x, y in zip(ka, kb)],
                            pa.string())})

    edges = (kg_cooccurrence(sf_dir)
             .map_batches(edge_rows, batch_format="pyarrow")
             .repartition(nparts).materialize())

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        bs = np.sort(g["b"].unique())
        if len(bs) > max_node_fanout:
            raise ValueError(
                f"anchor {g['a'].iloc[0]!r} has {len(bs)} oriented "
                f"neighbors (> max_node_fanout={max_node_fanout}); "
                "switch to degree orientation before trussing this graph")
        if len(bs) < 2:
            return pd.DataFrame({"a": [], "u": [], "v": [], "key": []})
        i, j = np.triu_indices(len(bs), k=1)
        return pd.DataFrame({
            "a": g["a"].iloc[0], "u": bs[i], "v": bs[j],
            "key": [x + "|" + y for x, y in zip(bs[i], bs[j])]})

    def support_of(e_ds):
        """(key, s) triangle-support table of the given edge set."""
        w = e_ds.groupby("a").map_groups(wedges, batch_format="pandas")
        closed = hash_semi_join(
            w, e_ds.select_columns(["key"]), on="key",
            num_partitions=nparts)

        def edge_keys(b: pa.Table) -> pa.Table:
            a = b["a"].to_pylist()
            u = b["u"].to_pylist()
            v = b["v"].to_pylist()
            ks = ([x + "|" + y for x, y in zip(a, u)]
                  + [x + "|" + y for x, y in zip(a, v)]
                  + [x + "|" + y for x, y in zip(u, v)])
            return pa.table({"key": pa.array(ks, pa.string()),
                             "n": pa.array([1] * len(ks), pa.int64())})

        return (closed.map_batches(edge_keys, batch_format="pyarrow")
                .groupby("key").aggregate(Sum("n", alias_name="s")))

    for _ in range(n_rounds):
        strong = (support_of(edges)
                  .map_batches(lambda b: b.filter(
                      pc.greater_equal(b["s"], k - 2)).select(["key"]),
                      batch_format="pyarrow"))
        edges = (hash_semi_join(edges, strong, on="key",
                                num_partitions=nparts)
                 .repartition(nparts).materialize())

    final = hash_lookup_join(edges, support_of(edges),
                             on="key", num_partitions=nparts).to_pandas()
    final = final.rename(columns={"a": "node_a", "b": "node_b",
                                  "s": "support"})
    final["support"] = final["support"].astype("int64")
    return (final[["node_a", "node_b", "support"]]
            .sort_values(["node_a", "node_b"]).reset_index(drop=True))
