"""Chi-square independence + PSI drift metrics (round 3, batch 9)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_chi2_matches_contingency_recompute(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        lang_source_chi2)

    got = lang_source_chi2(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "source"]).to_pandas()
    obs = pd.crosstab(docs["lang"], docs["source"])
    n = obs.to_numpy().sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    o = obs.to_numpy(np.float64)
    # full-grid statistic: empty observed cells contribute exp each
    chi2 = float(((o - exp) ** 2 / exp).sum())
    assert got["n"][0] == n
    assert got["dof"][0] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert abs(got["chi2"][0] - chi2) < 1e-4
    assert got["n_cells"][0] == (obs.to_numpy() > 0).sum()


def test_psi_zero_for_identical_split_of_uniform_data(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        value_psi)

    got = value_psi(SF)
    # both halves draw from the same generator: drift should be small
    assert 0.0 <= got["psi"][0] < 0.25
    assert got["n_before"][0] + got["n_after"][0] == 1000
    assert got["n_before"][0] > 0 and got["n_after"][0] > 0
