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


def test_gopher_rules_flags_and_conjunction(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import q_gopher_rules

    df = q_gopher_rules("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500 and df["doc_id"].is_unique
    flags = ["ok_words", "ok_mean_len", "ok_symbol", "ok_alpha", "ok_stop"]
    assert df[flags + ["keep"]].isin([0, 1]).all().all()
    # keep is exactly the conjunction of the five rules
    assert (df["keep"] == df[flags].prod(axis=1)).all()
    # hand-check one doc against the rule definitions
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    row = t.iloc[7]
    toks = (row["text"] or "").split()
    got = df.set_index("doc_id").loc[row["doc_id"]]
    assert got["n_tokens"] == len(toks)
    assert got["ok_mean_len"] == int(
        3 * len(toks) <= sum(map(len, toks)) <= 10 * len(toks))
