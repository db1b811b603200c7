"""The three non-SQL queries are value-checked against committed
single-process numpy oracles (VERDICT r4 #4) — the same comparison
scripts/check_oracles.py now performs in the consolidated gate."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df.reindex(sorted(df.columns), axis=1)
            .sort_values(sorted(df.columns)).reset_index(drop=True))


def _assert_match(engine: pd.DataFrame, oracle: pd.DataFrame,
                  float_atol: float = 2e-6):
    a, b = _canon(engine), _canon(oracle)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        if str(a[c].dtype).startswith("float") or \
                str(b[c].dtype).startswith("float"):
            av = pd.to_numeric(a[c]).to_numpy(dtype=np.float64)
            bv = pd.to_numeric(b[c]).to_numpy(dtype=np.float64)
            assert np.allclose(av, bv, atol=float_atol, rtol=0,
                               equal_nan=True), c
        else:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c


def test_embedding_pca_matches_numpy_oracle(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import queries
    from amharic_ecommerce_data_extractor_ray.np_oracles import (
        np_embedding_pca)

    engine = queries()["embedding_pca"](SF).to_pandas()
    _assert_match(engine, np_embedding_pca(SF))


def test_interpret_occlusion_matches_numpy_oracle(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import queries
    from amharic_ecommerce_data_extractor_ray.np_oracles import (
        np_interpret_occlusion)

    engine = queries()["interpret_occlusion"](SF).to_pandas()
    _assert_match(engine, np_interpret_occlusion(SF))


def test_unigram_train_matches_numpy_oracle(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import queries
    from amharic_ecommerce_data_extractor_ray.np_oracles import (
        np_unigram_train)

    engine = queries()["unigram_train"](SF)
    if hasattr(engine, "to_pandas"):
        engine = engine.to_pandas()
    _assert_match(engine, np_unigram_train(SF))
