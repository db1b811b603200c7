"""AUC / calibration / Gini evaluation statistics (round 3, session 5)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _auc_pairwise(scores, labels):
    """O(n²) reference: P(score_pos > score_neg) + 0.5·P(tie)."""
    s = np.asarray(scores, np.float64)
    y = np.asarray(labels, bool)
    pos, neg = s[y], s[~y]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.classify import binary_auc
    import ray.data as rd

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    got = binary_auc(rd.read_parquet(f"{SF}/documents.parquet",
                                     columns=["lang", "n_chars"]))
    want = _auc_pairwise(docs["n_chars"], docs["lang"] == "en")
    assert abs(got["auc"][0] - want) < 1e-5
    assert got["n_pos"][0] == (docs["lang"] == "en").sum()
    assert got["n"][0] == len(docs)


def test_auc_is_exactly_half_on_identical_distributions(ray_session):
    """Ties everywhere → every pair contributes 0.5 → AUC exactly 0.5."""
    from amharic_ecommerce_data_extractor_ray.stages.classify import binary_auc
    import ray.data as rd

    df = pd.DataFrame({"lang": ["en", "de"] * 50, "n_chars": [7] * 100})
    got = binary_auc(rd.from_pandas(df))
    assert got["auc"][0] == 0.5


def test_calibration_bins_partition_and_rates(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.classify import (
        calibration_bins)
    import ray.data as rd

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    got = calibration_bins(rd.read_parquet(f"{SF}/documents.parquet",
                                           columns=["lang", "n_chars"]))
    assert got["n"].sum() == len(docs)
    assert got["bin"].is_monotonic_increasing
    assert ((got["frac_pos"] >= 0) & (got["frac_pos"] <= 1)).all()
    # recompute one bin end-to-end
    c = np.minimum(docs["n_chars"].to_numpy(np.int64), 600)
    bins = np.minimum(c * 10 // 600, 9)
    b0 = int(got["bin"][0])
    sel = bins == b0
    assert got["n"][0] == sel.sum()
    want_rate = (docs["lang"][sel] == "en").mean()
    assert abs(got["frac_pos"][0] - want_rate) < 1e-5


def test_gini_matches_direct_recompute(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        gini_user_spend)

    got = gini_user_spend(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "value"]).to_pandas()
    v = ev["value"].to_numpy(np.float64)
    cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
    tot = pd.Series(cents).groupby(ev["user_id"]).sum().sort_values()
    x = tot.to_numpy(np.float64)
    n = len(x)
    i = np.arange(1, n + 1)
    want = ((2 * i - n - 1) * x).sum() / (n * x.sum())
    assert abs(got["gini"][0] - want) < 1e-5
    assert got["n_users"][0] == n
    assert got["total_cents"][0] == int(cents.sum())


def test_gini_zero_when_all_equal(ray_session):
    """Perfect equality → G = 0 exactly (degenerate fold sanity)."""
    import ray.data as rd
    from amharic_ecommerce_data_extractor_ray.pipelines import relational

    # monkeypatch-free: write a tiny parquet and point the query at it
    import tempfile, os, pyarrow as pa
    with tempfile.TemporaryDirectory() as d:
        t = pa.table({"user_id": pa.array(range(20), pa.int64()),
                      "value": pa.array([5.0] * 20)})
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = relational.gini_user_spend(d)
    assert got["gini"][0] == 0.0
    assert got["n_users"][0] == 20
