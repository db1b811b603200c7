"""Curation pipeline: quality filter → exact dedup → manifest, with the
dedup semi-join running distributed (no driver-side kept-id set)."""

import pyarrow as pa


def _docs_ds(rd, n_unique, n_dup_groups=0, dup_size=3):
    """n_unique distinct good docs + n_dup_groups groups of dup_size exact
    duplicates + a few rows the quality filter drops."""
    rows = []
    i = 0
    for _ in range(n_unique):
        rows.append({"doc_id": i, "text": f"unique document body {i} " * 3})
        i += 1
    for g in range(n_dup_groups):
        for _ in range(dup_size):
            rows.append({"doc_id": i, "text": f"duplicated body {g} " * 3})
            i += 1
    # dropped by the filter: too few tokens / too punctuation-heavy
    rows.append({"doc_id": i, "text": "short"})
    rows.append({"doc_id": i + 1, "text": "a b c d e ....,,,;;;!!!???---..."})
    return rd.from_items(rows), i


def test_curate_dedup_and_filter(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.curate import curate_dataset

    ds, n_kept_plus = _docs_ds(rd, n_unique=50, n_dup_groups=5)
    out = curate_dataset(ds).to_pandas().sort_values("doc_id")
    # 50 unique + 5 dup-group winners; filtered rows gone
    assert len(out) == 55
    # each dup group keeps its LOWEST doc_id (groups start at id 50, step 3)
    dup_winners = sorted(out[out["doc_id"] >= 50]["doc_id"])
    assert dup_winners == [50, 53, 56, 59, 62]
    assert set(out.columns) == {"doc_id", "q_tokens", "q_punct", "text_sha256"}


def test_curate_survivor_set_larger_than_one_batch(ray_session):
    """100K survivors ≫ one batch: the semi-join must carry the kept-id set
    distributed (VERDICT r1 #1 done-criterion)."""
    import numpy as np
    import ray.data as rd

    n = 100_000
    ids = np.arange(n, dtype=np.int64)
    texts = [f"doc body number {i} with enough tokens to pass" for i in ids]
    # one duplicate pair at the end: doc n duplicates doc 0
    tab = pa.table({
        "doc_id": pa.array(list(ids) + [n], pa.int64()),
        "text": pa.array(texts + [texts[0]], pa.string()),
    })
    ds = rd.from_arrow(tab).repartition(16)

    from amharic_ecommerce_data_extractor_ray.pipelines.curate import curate_dataset

    out = curate_dataset(ds, num_partitions=8)
    assert out.count() == n  # all unique survive; dup of doc 0 dropped
    kept = set(out.filter(lambda r: r["doc_id"] >= n - 2).to_pandas()["doc_id"])
    assert n not in kept and (n - 1) in kept
