"""Decontamination apply + winsorized means (round 3, batch 8)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_decontaminate_drops_exactly_the_flagged_set(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_contamination, q_decontaminate)

    scan = q_contamination(SF).to_pandas()
    flagged = set(scan[scan["contaminated"]]["doc_id"])
    survivors = q_decontaminate(SF)
    all_ids = set(pq.read_table(f"{SF}/documents.parquet",
                                columns=["doc_id"])["doc_id"].to_pylist())
    assert set(survivors["doc_id"]) == all_ids - flagged
    assert len(flagged) > 0


def test_winsorized_means_vs_duckdb_and_bounds(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        winsorized_means_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        winsorized_means)

    got = winsorized_means(SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = con.execute(winsorized_means_sql(0.1, 0.9)).df()
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    for c in ("p_lo", "p_hi", "winsorized_mean", "trimmed_mean"):
        assert np.abs(got[c] - want[c]).max() < 1e-6, c
    # clipping keeps the robust means inside the cut points
    assert (got["winsorized_mean"] >= got["p_lo"]).all()
    assert (got["winsorized_mean"] <= got["p_hi"]).all()
    assert (got["trimmed_mean"] >= got["p_lo"]).all()
    assert (got["trimmed_mean"] <= got["p_hi"]).all()
