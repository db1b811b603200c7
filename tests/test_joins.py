"""asof_join custom operator: backward as-of semantics per key."""

import pandas as pd


def test_asof_join_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import asof_join

    t = lambda s: pd.Timestamp(f"2024-01-01 {s}")
    left = rd.from_items([
        {"lid": 1, "user": 1, "ts": t("10:00")},   # matches r at 09:30
        {"lid": 2, "user": 1, "ts": t("09:00")},   # before any right → null
        {"lid": 3, "user": 1, "ts": t("09:30")},   # EQUAL ts matches (<=)
        {"lid": 4, "user": 2, "ts": t("12:00")},   # user 2 has no right rows
        {"lid": 5, "user": 1, "ts": t("11:00")},   # matches r at 10:30
    ])
    right = rd.from_items([
        {"rid": 10, "user": 1, "ts": t("09:30")},
        {"rid": 11, "user": 1, "ts": t("10:30")},
    ])
    out = (asof_join(left, right, by="user", on="ts",
                     right_cols=["ts", "rid"])
           .to_pandas().sort_values("lid").reset_index(drop=True))
    got = {int(r["lid"]): (None if pd.isna(r["rid_r"]) else int(r["rid_r"]))
           for _, r in out.iterrows()}
    assert got == {1: 10, 2: None, 3: 10, 4: None, 5: 11}
    assert len(out) == 5  # every left row exactly once


def test_asof_join_survives_repartition(ray_session):
    """Co-location comes from the groupby, not input partitioning."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = rd.from_items([
        {"lid": i, "user": i % 5, "ts": t0 + pd.Timedelta(minutes=i)}
        for i in range(100)]).repartition(7)
    right = rd.from_items([
        {"rid": 1000 + i, "user": i % 5,
         "ts": t0 + pd.Timedelta(minutes=i, seconds=30)}
        for i in range(100)]).repartition(3)
    out = asof_join(left, right, by="user", on="ts",
                    right_cols=["ts", "rid"]).to_pandas()
    assert len(out) == 100
    # each left at minute i matches the same-user right at minute i-5 + 30s
    m = out.set_index("lid")
    assert int(m.loc[42, "rid_r"]) == 1000 + 37
    assert pd.isna(m.loc[3, "rid_r"])  # first event per user: no prior right


def test_hash_anti_join_semantics(ray_session):
    """Left rows whose key appears in right are dropped; payload intact."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        hash_anti_join)

    left = rd.from_items([
        {"doc_id": i, "text": f"t{i}", "w": float(i)} for i in range(50)
    ]).repartition(5)
    right = rd.from_items([
        {"doc_id": i, "junk": "payload never shuffled"}
        for i in range(0, 50, 3)] + [
        {"doc_id": 999, "junk": "key absent from left"}]).repartition(3)
    out = hash_anti_join(left, right, on="doc_id",
                         num_partitions=4).to_pandas()
    expect = sorted(i for i in range(50) if i % 3 != 0)
    assert sorted(out["doc_id"]) == expect
    assert sorted(out.columns) == ["doc_id", "text", "w"]
    row = out.set_index("doc_id").loc[7]
    assert row["text"] == "t7" and row["w"] == 7.0


def test_hash_anti_join_empty_right(ray_session):
    """An empty right side keeps every left row."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        hash_anti_join)

    left = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(10)])
    right = rd.from_items([{"doc_id": 1}]).filter(lambda r: False)
    out = hash_anti_join(left, right, on="doc_id").to_pandas()
    assert sorted(out["doc_id"]) == list(range(10))


def test_dedup_survivors_matches_driver_style_oracle(ray_session):
    """End-to-end apply step vs the DuckDB recursive-CTE recompute."""
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from amharic_ecommerce_data_extractor_ray import oracles
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_dedup_survivors)

    got = (q_dedup_survivors(sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.execute(oracles.dedup_survivors_sql(oracles.minhash_sql()))
            .df().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(want) and len(got) > 0
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["text"]) == list(want["text"])
    # it actually dropped something at sf0.001 (25 minhash pairs exist)
    ndocs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(got) < ndocs


def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        _bloom_set, _bloom_test)

    m_bits, k = 1 << 16, 4
    rng = np.random.default_rng(7)
    members = rng.choice(1 << 40, size=2000, replace=False).astype(np.uint64)
    others = (rng.choice(1 << 40, size=20000, replace=False)
              .astype(np.uint64))
    others = np.setdiff1d(others, members)
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    _bloom_set(words, members, m_bits, k)
    assert _bloom_test(words, members, m_bits, k).all()   # no false negatives
    fp = _bloom_test(words, others, m_bits, k).mean()
    # (1 - e^{-kn/m})^k ≈ 0.0009 at n=2000, m=65536, k=4; allow 5x slack
    assert fp < 0.005


def test_hash_semi_join_and_bloom_semi_join_match_pandas(ray_session):
    import numpy as np
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        bloom_semi_join, hash_semi_join)

    rng = np.random.default_rng(11)
    left = rd.from_items([{"k": int(v), "payload": i}
                          for i, v in enumerate(rng.integers(0, 50, 300))])
    right = rd.from_items([{"k": int(v)}
                           for v in rng.integers(25, 60, 40)])
    want = sorted(i for i, v in enumerate(
        left.to_pandas()["k"]) if v in set(right.to_pandas()["k"]))
    for fn in (hash_semi_join, bloom_semi_join):
        out = fn(left, right, on="k").to_pandas()
        assert sorted(out["payload"]) == want, fn.__name__


def test_bloom_prefilter_actually_prunes(ray_session):
    """The broadcast filter must drop non-candidate rows BEFORE the shuffle:
    with a tiny right side, the candidate stream is ~|matches|, not |left|."""
    import ray
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        _bloom_test, _column_u64, build_bloom)

    left = rd.from_items([{"k": i} for i in range(10_000)])
    right = rd.from_items([{"k": i} for i in range(0, 10_000, 100)])  # 1%
    words = build_bloom(right, on="k")
    import pyarrow as pa

    keys = _column_u64(pa.array([r["k"] for r in left.take_all()],
                                pa.int64()))
    kept = _bloom_test(words, keys, 1 << 20, 4).sum()
    assert kept < 10_000 * 0.02   # ≥98% of the fact table never shuffles


def test_upsert_merge_last_writer_wins(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import upsert_merge

    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "val": pa.array(["a", "b", "c", "d"], pa.string()),
        "version": pa.array([1, 1, 1, 1], pa.int64())}))
    delta = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 5], pa.int64()),          # 5 is an INSERT
        "val": pa.array(["B", "D", "E"], pa.string()),
        "version": pa.array([2, 2, 2], pa.int64())}))
    out = (upsert_merge(base, delta, key="k", version_col="version")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": [1, 2, 3, 4, 5],
                         "val": ["a", "B", "c", "D", "E"],
                         "version": [1, 2, 1, 2, 2]})
    pd.testing.assert_frame_equal(out, want)


def test_upsert_merge_multi_delta_chain(ray_session):
    """Two deltas with increasing versions compose like sequential applies."""
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import upsert_merge

    base = rd.from_arrow(pa.table({
        "k": pa.array(range(10), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(10)], pa.string()),
        "version": pa.array([0] * 10, pa.int64())}))
    d1 = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "val": pa.array(["x1", "x2"], pa.string()),
        "version": pa.array([1, 1], pa.int64())}))
    d2 = rd.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()),
        "val": pa.array(["y2", "y3"], pa.string()),
        "version": pa.array([2, 2], pa.int64())}))
    once = (upsert_merge(upsert_merge(base, d1, key="k",
                                      version_col="version"),
                         d2, key="k", version_col="version")
            .to_pandas().sort_values("k").reset_index(drop=True))
    both = (upsert_merge(base, d1.union(d2), key="k", version_col="version")
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert once.equals(both)
    assert list(once.loc[once["k"].isin([1, 2, 3]), "val"]) == \
        ["x1", "y2", "y3"]


def test_hash_lookup_join_big_int64_payload_exact(ray_session):
    """Regression (VERDICT r4 #2): a null-bearing int64 payload with values
    above 2**53 must survive the bucketed lookup join EXACTLY.  The old
    pandas bucket_merge coerced null-bearing int64 to float64, silently
    rounding 63-bit md5-style ids to the nearest representable double."""
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        arrow_inner_merge, hash_lookup_join)

    big = (1 << 60) + 1            # not representable as float64
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        # null-bearing big-int payload on the LEFT side
        "payload": pa.array([big, None, big + 2, big + 4], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 9], pa.int64()),
        # null-bearing big-int payload on the RIGHT (value) side
        "val": pa.array([big + 1, None, big + 3, 0], pa.int64()),
    }))
    # stay in Arrow end-to-end: to_pandas() on a null-bearing int64 would
    # itself coerce to float64 and mask/cause the corruption under test
    out = (hash_lookup_join(left, right, on="k", num_partitions=4)
           .sort("k").take_batch(10, batch_format="pyarrow"))
    assert out["k"].to_pylist() == [1, 2, 3]
    assert out["payload"].to_pylist() == [big, None, big + 2]
    assert out["val"].to_pylist() == [big + 1, None, big + 3]

    # the shared helper itself: duplicates on both sides, exact ints
    l_t = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "p": pa.array([big, None], pa.int64())})
    r_t = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "v": pa.array([None, big + 7], pa.int64())})
    m = arrow_inner_merge(l_t, r_t, "k")
    assert m.num_rows == 4
    assert set(m["p"].to_pylist()) == {big, None}
    assert set(m["v"].to_pylist()) == {None, big + 7}


def test_best_survivor_big_cluster_ids_exact(ray_session):
    """The survivor attach is arrow-native: 63-bit cluster ids round-trip."""
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        best_survivor_per_cluster)

    big = (1 << 62) + 5
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "n_chars": pa.array([5, 9, 7], pa.int64())}))
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "cluster_id": pa.array([big, big, big + 1], pa.int64())}))
    out = (best_survivor_per_cluster(docs, clusters)
           .to_pandas().sort_values("cluster_id").reset_index(drop=True))
    assert [int(c) for c in out["cluster_id"]] == [big, big + 1]
    assert [int(d) for d in out["doc_id"]] == [11, 12]
    assert [int(q) for q in out["n_chars"]] == [9, 7]
    assert [int(n) for n in out["n_members"]] == [2, 1]


def test_asof_join_big_int64_payload_exact(ray_session):
    """Regression (VERDICT r4 #2 class): the as-of merge previously ran as
    a pandas group over the tagged union, coercing null-padded int64
    payloads to float64 (>2**53 values corrupt).  Arrow-split version must
    carry them exactly, and pad unmatched left rows with typed nulls."""
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import asof_join

    big = (1 << 59) + 3
    left = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([5, 50, 5], pa.int64()),
        "lpay": pa.array([big, big + 2, None], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "uid": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 40], pa.int64()),
        "rpay": pa.array([big + 1, None], pa.int64()),
    }))
    out = (asof_join(left, right, by="uid", on="ts", right_cols=["rpay"])
           .sort(["uid", "ts"]).take_batch(10, batch_format="pyarrow"))
    assert out["lpay"].to_pylist() == [big, big + 2, None]
    # uid=1 ts=5 precedes every right row -> null; ts=50 matches ts=40 row
    # (rpay null); uid=2 has no right rows at all -> typed null
    assert out["rpay_r"].to_pylist() == [None, None, None]
    assert out["ts_r"].to_pylist() == [None, 40, None]

    # a matched non-null big payload round-trips exactly
    right2 = rd.from_arrow(pa.table({
        "uid": pa.array([1], pa.int64()),
        "ts": pa.array([10], pa.int64()),
        "rpay": pa.array([big + 7], pa.int64()),
    }))
    out2 = (asof_join(left, right2, by="uid", on="ts", right_cols=["rpay"])
            .sort(["uid", "ts"]).take_batch(10, batch_format="pyarrow"))
    assert out2["rpay_r"].to_pylist() == [None, big + 7, None]
