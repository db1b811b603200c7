"""Deequ-style expectations suite + langid confusion: engine vs DuckDB
oracle plus constraint-semantics checks."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_expectations_report_matches_oracle(ray_session):
    from amharic_ecommerce_data_extractor_ray import oracles
    from amharic_ecommerce_data_extractor_ray.stages.expectations import (
        expectations_report)

    got = expectations_report(SF).reset_index(drop=True)
    want = (_oracle(oracles.expectations_report_sql())
            .sort_values("check").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the tight discount bound demonstrably fires
    row = got.set_index("check").loc["lineitem.discount_in_range"]
    assert row["n_violations"] > 0
    # clean-data invariants hold
    for c in ("orders.orderkey_unique", "lineitem.orderkey_in_orders",
              "orders.custkey_not_null"):
        assert got.set_index("check").loc[c, "n_violations"] == 0


def test_langid_confusion_totals(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_langid_confusion)

    cm = q_langid_confusion(SF).to_pandas()
    assert int(cm["n"].sum()) == 500          # one cell per corpus message
    assert set(cm["pred_lang"]) <= {"am", "other", "und"}


def test_rfm_scores_band_semantics(ray_session):
    import numpy as np

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        rfm_scores)

    df = rfm_scores(SF, n_bands=5).to_pandas()
    assert df["user_id"].is_unique
    for metric, band in (("recency_days", "r_band"),
                         ("frequency", "f_band"),
                         ("monetary_cents", "m_band")):
        g = (df.groupby(band)[metric].agg(["min", "max"]).sort_index())
        # bands are monotone intervals over the metric
        assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
        assert df[band].between(1, 5).all()
        # equal metric values share a band (tie-sharing semantics)
        assert (df.groupby(metric)[band].nunique() == 1).all()
