"""Round-3 additions: HyperLogLog distinct sketch, count-min frequency
sketch, token-window chunking, and corpus-LM perplexity scoring."""

import numpy as np


def test_hll_error_bound_and_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        approx_ndistinct_hll)

    n_distinct = 20000
    rows = [{"v": f"val_{i % n_distinct}"} for i in range(60000)]
    est1 = approx_ndistinct_hll(
        rd.from_items(rows), "v", p=12).to_pandas()["approx_ndistinct"][0]
    # p=12 → expected relative error ≈ 1.04/sqrt(4096) ≈ 1.6%; assert 8%
    assert abs(est1 - n_distinct) / n_distinct < 0.08, est1
    # register-max merge ⇒ estimate invariant to block layout
    est32 = approx_ndistinct_hll(
        rd.from_items(rows).repartition(32), "v",
        p=12).to_pandas()["approx_ndistinct"][0]
    assert est1 == est32


def test_hll_small_range_linear_counting(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        approx_ndistinct_hll)

    rows = [{"v": f"x{i % 50}"} for i in range(2000)]
    est = approx_ndistinct_hll(
        rd.from_items(rows), "v", p=12).to_pandas()["approx_ndistinct"][0]
    # linear-counting regime: tiny cardinalities are near-exact
    assert abs(est - 50) <= 2, est


def test_countmin_upper_bound_and_heavy_hitter(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import countmin_topk

    # 200 docs; token "hot" appears 3× per doc, tail tokens once each
    rows = [{"text": f"hot hot hot tail_{i} tail_{(i * 7) % 151}"}
            for i in range(200)]
    out = countmin_topk(rd.from_items(rows).repartition(8),
                        text_col="text", k=5, depth=4,
                        width=2048).to_pandas()
    assert out.iloc[0]["token"] == "hot"
    # count-min never underestimates
    assert out.iloc[0]["n_est"] >= 600
    # with 2048-wide rows and ~150 tail tokens, the top estimate is exact
    assert out.iloc[0]["n_est"] == 600


def test_chunking_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import token_chunks

    docs = [
        {"doc_id": 1, "text": "a b c d e f g"},   # 7 tokens
        {"doc_id": 2, "text": "  "},              # empty → no chunks
        {"doc_id": 3, "text": "x y z"},           # 3 tokens → 1 chunk
    ]
    out = token_chunks(rd.from_items(docs), window=4,
                       stride=3).to_pandas()
    got = out.to_dict("records")
    assert got == [
        {"doc_id": 1, "chunk_id": 0, "start": 0, "n_tokens": 4,
         "chunk_text": "a b c d"},
        {"doc_id": 1, "chunk_id": 1, "start": 3, "n_tokens": 4,
         "chunk_text": "d e f g"},
        {"doc_id": 1, "chunk_id": 2, "start": 6, "n_tokens": 1,
         "chunk_text": "g"},
        {"doc_id": 3, "chunk_id": 0, "start": 0, "n_tokens": 3,
         "chunk_text": "x y z"},
    ]


def test_chunking_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import token_chunks

    docs = [{"doc_id": i, "text": " ".join(f"t{j}" for j in range(i % 9))}
            for i in range(60)]
    a = token_chunks(rd.from_items(docs), window=3, stride=2).to_pandas()
    b = token_chunks(rd.from_items(docs).repartition(16), window=3,
                     stride=2).to_pandas()
    assert a.equals(b)


def test_perplexity_formula_and_ordering(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        doc_perplexity)

    # corpus: "common" appears 12×, "rare" once → the rare-token doc is
    # higher-perplexity under the corpus LM
    docs = ([{"doc_id": i, "text": "common common common"}
             for i in range(4)]
            + [{"doc_id": 99, "text": "rare common"}])
    out = doc_perplexity(rd.from_items(docs), k_smooth=1.0).to_pandas()
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 99]
    # hand-computed: N=14 tokens, V=2; p(common)=(13+1)/(14+2)=0.875,
    # p(rare)=(1+1)/16=0.125
    ppl_common = round(float(np.exp(-np.log(0.875))), 6)
    ppl_mixed = round(float(
        np.exp(-(np.log(0.125) + np.log(0.875)) / 2)), 6)
    assert out.set_index("doc_id").loc[0, "ppl"] == ppl_common
    assert out.set_index("doc_id").loc[99, "ppl"] == ppl_mixed
    assert ppl_mixed > ppl_common
    assert out.set_index("doc_id").loc[99, "n_tokens"] == 2


def test_perplexity_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        doc_perplexity)

    docs = [{"doc_id": i,
             "text": " ".join(f"w{(i * j) % 23}" for j in range(1, 8))}
            for i in range(80)]
    a = doc_perplexity(rd.from_items(docs)).to_pandas()
    b = doc_perplexity(rd.from_items(docs).repartition(16)).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["ppl"], b["ppl"], rtol=0, atol=1e-6)


def test_hash_lookup_join_inner_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import hash_lookup_join

    left = rd.from_items([{"k": f"key{i % 5}", "x": i} for i in range(20)])
    right = rd.from_items([{"k": "key0", "v": 100}, {"k": "key1", "v": 101},
                           {"k": "key1", "v": 201},  # multiplicity → 2 rows
                           {"k": "zzz", "v": 999}])  # unmatched → dropped
    out = (hash_lookup_join(left, right, on="k", num_partitions=4)
           .to_pandas().sort_values(["k", "x", "v"]).reset_index(drop=True))
    # key0: 4 left rows × 1; key1: 4 × 2; keys 2-4 unmatched; zzz dropped
    assert len(out) == 4 + 8
    assert set(out.columns) == {"k", "x", "v"}
    assert (out[out.k == "key1"].groupby("x").size() == 2).all()


def test_hash_lookup_join_int_keys_block_invariant(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import hash_lookup_join

    left = rd.from_items([{"k": i % 7, "x": i} for i in range(50)])
    right = rd.from_items([{"k": i, "v": i * 10} for i in range(7)])
    a = (hash_lookup_join(left, right, on="k", num_partitions=3)
         .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    b = (hash_lookup_join(left.repartition(13), right.repartition(5),
                          on="k", num_partitions=8)
         .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a["v"] == a["k"] * 10).all()


def test_pack_bins_greedy_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import pack_bins

    docs = [
        {"doc_id": 1, "source": "a", "text": "w " * 6},    # 6 tokens
        {"doc_id": 2, "source": "a", "text": "w " * 3},    # 6+3=9 > 8 → bin 1
        {"doc_id": 3, "source": "a", "text": "w " * 5},    # 3+5=8 ≤ 8 → bin 1
        {"doc_id": 4, "source": "a", "text": "w " * 12},   # oversized → bin 2
        {"doc_id": 5, "source": "a", "text": "w"},         # 12+1 > 8 → bin 3
        {"doc_id": 6, "source": "b", "text": "w " * 2},    # new group → bin 0
    ]
    out = pack_bins(rd.from_items(docs), budget=8,
                    group_col="source").to_pandas()
    assert out["bin"].tolist() == [0, 1, 1, 2, 3, 0]
    assert out["n_tokens"].tolist() == [6, 3, 5, 12, 1, 2]


def test_pack_bins_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import pack_bins

    docs = [{"doc_id": i, "source": f"s{i % 3}",
             "text": "tok " * ((i * 13) % 40)} for i in range(90)]
    a = pack_bins(rd.from_items(docs), budget=64).to_pandas()
    b = pack_bins(rd.from_items(docs).repartition(16), budget=64).to_pandas()
    assert a.equals(b)
    # every bin except a group's last is filled past budget by the NEXT doc:
    # within (source, bin), token sums never exceed budget unless singleton
    sums = a.groupby(["source", "bin"]).agg(n=("n_tokens", "sum"),
                                            c=("n_tokens", "size"))
    assert ((sums["n"] <= 64) | (sums["c"] == 1)).all()


def test_window_dedup_and_waiting_suppliers_shapes(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        waiting_suppliers, window_dedup_events)

    sf = "/root/testdata/sf0.001"
    wd = window_dedup_events(sf).to_pandas()
    assert (wd["n_dups"] >= 0).all()
    # kept id is the min of its group by construction; spot-check dup rows
    assert wd["kept_event_id"].is_unique
    ws = waiting_suppliers(sf)
    assert list(ws.columns) == ["s_name", "numwait"]
    assert ws["numwait"].is_monotonic_decreasing


def test_pq_codes_reconstruction_beats_random(ray_session):
    """PQ codes must (a) be block-invariant, (b) reconstruct vectors
    better than a shuffled code assignment — i.e. the codebooks learned
    something."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import pq_codes

    rng = np.random.default_rng(7)
    # 4 latent clusters per subspace half
    base = rng.normal(size=(8, 16))
    vecs = base[rng.integers(0, 8, size=200)] + \
        rng.normal(scale=0.05, size=(200, 16))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(200)]
    a = pq_codes(rd.from_items(rows), m_subspaces=2, k_codes=8,
                 n_iter=2).to_pandas()
    b = pq_codes(rd.from_items(rows).repartition(16), m_subspaces=2,
                 k_codes=8, n_iter=2).to_pandas()
    assert a.equals(b)
    assert len(a) == 400  # 200 vecs × 2 subspaces
    # vectors closer than ~4× the noise radius in subspace 0 should
    # (almost always — Lloyd's from k=8 seeds may split one latent
    # cluster) share a code
    codes = a.pivot(index="vec_id", columns="m", values="code")
    d0 = np.linalg.norm(vecs[:, None, :8] - vecs[None, :, :8], axis=2)
    same0 = codes[0].to_numpy()[:, None] == codes[0].to_numpy()[None, :]
    close = (d0 < 0.2) & ~np.eye(200, dtype=bool)
    assert same0[close].mean() > 0.9


def test_gap_fill_locf_semantics(ray_session):
    import pandas as pd

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        gap_fill_locf)

    out = gap_fill_locf("/root/testdata/sf0.001")
    g = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    # spans are contiguous per user
    for uid, grp in g.groupby("user_id"):
        days = pd.to_datetime(grp["day"])
        assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
        # first day of each user is always observed, never filled
        assert not grp.iloc[0]["filled"]
    # filled rows carry the previous row's value
    g2 = g.reset_index(drop=True)
    filled_idx = g2.index[g2["filled"]]
    for i in filled_idx:
        assert g2.loc[i, "value"] == g2.loc[i - 1, "value"]
        assert g2.loc[i, "user_id"] == g2.loc[i - 1, "user_id"]


def test_jsonl_roundtrip_preserves_bytes(ray_session):
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_jsonl_roundtrip)

    got = (q_jsonl_roundtrip("/root/testdata/sf0.001").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text", "lang", "source"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)


def test_q17_q4_shapes_vs_duckdb(ray_session):
    """Direct engine-vs-DuckDB differential for the two decorrelated
    subquery shapes (same check the driver gate runs, pinned in-tests)."""
    import duckdb

    from amharic_ecommerce_data_extractor_ray.oracles import (
        priority_order_counts_sql, small_quantity_revenue_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        priority_order_counts, small_quantity_revenue)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    got = small_quantity_revenue(sf).to_pandas()
    want = con.execute(small_quantity_revenue_sql(0.5)).df()
    assert got["n_lines"][0] == want["n_lines"][0] > 0
    assert abs(got["total_revenue"][0] - want["total_revenue"][0]) < 1e-6

    got4 = priority_order_counts(sf)
    want4 = (con.execute(priority_order_counts_sql()).df()
             .sort_values("o_orderpriority").reset_index(drop=True))
    assert got4.equals(want4)


def test_pq_adc_recall_vs_brute_force(ray_session):
    """ADC over 2×16 codebooks must retrieve a decent fraction of the true
    top-10 (structured corpus → quantization preserves neighborhoods),
    and must be invariant to block layout."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        brute_force_topk, pq_adc_topk)

    rng = np.random.default_rng(11)
    base = rng.normal(size=(16, 64))
    vecs = base[rng.integers(0, 16, size=300)] + \
        rng.normal(scale=0.1, size=(300, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(300)]
    ds = rd.from_items(rows)
    qids = list(range(5))
    adc = pq_adc_topk(ds, qids, k=10, m_subspaces=2, k_codes=16, n_iter=2)
    bf = brute_force_topk(ds, qids, k=10).to_pandas()
    recalls = []
    for q in qids:
        a = set(adc[adc["query_id"] == q]["neighbor_id"])
        b = set(bf[bf["query_id"] == q]["neighbor_id"])
        recalls.append(len(a & b) / 10)
    assert np.mean(recalls) >= 0.5, recalls
    adc2 = pq_adc_topk(ds.repartition(16), qids, k=10, m_subspaces=2,
                       k_codes=16, n_iter=2)
    assert adc.equals(adc2)


def test_pq_adc_rerank_recovers_recall(ray_session):
    """Exact re-rank of the ADC shortlist must retrieve at least as much of
    the true top-10 as plain ADC (it can only promote true neighbors the
    shortlist contains), and a generous shortlist must pin a high floor."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        brute_force_topk, pq_adc_rerank_topk, pq_adc_topk)

    rng = np.random.default_rng(11)
    base = rng.normal(size=(16, 64))
    vecs = base[rng.integers(0, 16, size=300)] + \
        rng.normal(scale=0.1, size=(300, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(300)]
    ds = rd.from_items(rows)
    qids = list(range(5))
    bf = brute_force_topk(ds, qids, k=10).to_pandas()
    adc = pq_adc_topk(ds, qids, k=10, m_subspaces=2, k_codes=16, n_iter=2)
    rr = pq_adc_rerank_topk(ds, qids, k=10, shortlist=50, m_subspaces=2,
                            k_codes=16, n_iter=2)

    def mean_recall(df):
        rs = []
        for q in qids:
            a = set(df[df["query_id"] == q]["neighbor_id"])
            b = set(bf[bf["query_id"] == q]["neighbor_id"])
            rs.append(len(a & b) / 10)
        return float(np.mean(rs))

    assert mean_recall(rr) >= mean_recall(adc)
    assert mean_recall(rr) >= 0.8, mean_recall(rr)
    # block-layout invariance
    rr2 = pq_adc_rerank_topk(ds.repartition(16), qids, k=10, shortlist=50,
                             m_subspaces=2, k_codes=16, n_iter=2)
    assert rr.equals(rr2)


def test_partition_prune_reads_one_directory(ray_session, tmp_path):
    """The pruned read must touch only the selected partition directory
    (layout check) and reproduce the filtered aggregate."""
    import os

    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        partitioned_write_prune)

    sf = "/root/testdata/sf0.001"
    out = partitioned_write_prune(sf, priority="1-URGENT").to_pandas()
    src = rd.read_parquet(f"{sf}/orders.parquet").to_pandas()
    want = src[src["o_orderpriority"] == "1-URGENT"]
    assert out["n_orders"][0] == len(want)
    assert abs(out["total_price"][0]
               - round(want["o_totalprice"].sum(), 4)) < 1e-6


def test_ewma_recurrence(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        ewma_daily)

    out = ewma_daily("/root/testdata/sf0.001", alpha=0.3).to_pandas()
    # v_0 = x_0; each subsequent smoothed value lies between the previous
    # smoothed value and the day's raw value (convexity of the recurrence)
    for _, g in out.groupby("user_id"):
        g = g.sort_values("day")
        assert g.iloc[0]["ewma"] == g.iloc[0]["value"]
        prev = g["ewma"].shift(1).to_numpy()[1:]
        cur = g["ewma"].to_numpy()[1:]
        val = g["value"].to_numpy()[1:]
        lo = np.minimum(prev, val) - 1e-6
        hi = np.maximum(prev, val) + 1e-6
        assert ((cur >= lo) & (cur <= hi)).all()


def test_trainset_build_composition(ray_session):
    """The composed pipeline must equal manually chaining its stages."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.curate import (
        curate_dataset)
    from amharic_ecommerce_data_extractor_ray.pipelines.trainset import (
        build_trainset)
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        doc_perplexity)

    sf = "/root/testdata/sf0.001"
    out = build_trainset(sf, ppl_threshold=40.0).to_pandas()
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    surv = set(curate_dataset(docs).to_pandas()["doc_id"])
    kept_docs = docs.map_batches(
        lambda b: b.filter(
            __import__("pyarrow").array(
                [i in surv for i in b["doc_id"].to_pylist()])),
        batch_format="pyarrow")
    ppl = doc_perplexity(kept_docs).to_pandas()
    allowed = set(ppl[ppl["ppl"] <= 40.0]["doc_id"])
    assert set(out["doc_id"]) <= allowed
    assert len(allowed - set(out["doc_id"])) == 0  # every kept doc chunks
    # the ppl filter actually did something on this corpus
    assert len(allowed) < len(surv)


def test_dsir_weights_prefer_target_like_docs(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import dsir_weights

    # target slice (lang=en) speaks "alpha beta"; raw background speaks
    # "gamma delta"; a held-out doc written in target language must score
    # higher than one written in background language
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "lang": "en",
                     "text": "alpha beta alpha beta alpha"})
    for i in range(20, 40):
        rows.append({"doc_id": i, "lang": "de",
                     "text": "gamma delta gamma delta gamma"})
    rows.append({"doc_id": 100, "lang": "xx",
                 "text": "alpha beta alpha"})          # target-like
    rows.append({"doc_id": 101, "lang": "xx",
                 "text": "gamma delta gamma"})         # background-like
    out = (dsir_weights(rd.from_items(rows), target_value="en")
           .to_pandas().set_index("doc_id"))
    assert out.loc[100, "dsir_logweight"] > 0
    assert out.loc[101, "dsir_logweight"] < 0
    assert out.loc[100, "dsir_logweight"] > out.loc[101, "dsir_logweight"]
    # n_feats = unigrams + bigrams = 3 + 2
    assert out.loc[100, "n_feats"] == 5


def test_bpe_pair_stats_counts(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        bpe_pair_stats)

    # "abab" → ab, ba, ab ; "ab" → ab ; "xy" → xy ; pairs never cross the
    # token boundary
    ds = rd.from_items([{"text": "abab ab"}, {"text": "xy"}])
    out = bpe_pair_stats(ds, top_n=10)
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"ab": 3, "ba": 1, "xy": 1}
    # deterministic ordering: n desc then pair asc
    assert out["pair"].tolist() == ["ab", "ba", "xy"]


def test_bpe_pair_stats_multibyte(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        bpe_pair_stats)

    ds = rd.from_items([{"text": "ሰላም ሰላም"}])
    out = bpe_pair_stats(ds, top_n=10)
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"ሰላ": 2, "ላም": 2}
