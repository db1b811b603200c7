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


def test_late_event_audit_semantics(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        late_event_audit)

    df = late_event_audit(SF, lateness_hours=24).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    assert len(df) == len(ev)
    # the synthetic stream arrives in event-time order: ZERO late events
    # is the CORRECT answer (pinned invariant, matches the oracle)
    assert df["is_late"].sum() == 0 and df["lateness_sec"].eq(0).all()

    # firing path: a shuffled synthetic stream (arrival != event time)
    import pandas as pd
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        watermark_audit)

    base = np.datetime64("2026-01-01T00:00:00", "us")
    hours = [0, 50, 1, 2, 100, 3]          # events 2,3,5 arrive way late
    synth = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.zeros(6, dtype=np.int64),
        "ts": [base + np.timedelta64(h, "h") for h in hours],
    })
    got = (watermark_audit(rd.from_pandas(synth), lateness_hours=24)
           .to_pandas().sort_values("event_id"))
    # watermark after arrival of hour-50 event = 50-24 = 26h
    assert got["is_late"].tolist() == [0, 0, 1, 1, 0, 1]
    assert got["lateness_sec"].tolist() == [
        0, 0, 25 * 3600, 24 * 3600, 0, 73 * 3600]


def test_pretrain_corpus_composition(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_gopher_rules, q_pretrain_corpus)
    from amharic_ecommerce_data_extractor_ray.pipelines.trainset import (
        curriculum_order)

    out = q_pretrain_corpus(SF).to_pandas()
    flags = q_gopher_rules(SF).to_pandas()
    keep_ids = set(flags.loc[flags["keep"] == 1, "doc_id"])
    # survivors are a subset of the quality-kept docs, unique ids
    assert out["doc_id"].is_unique
    assert set(out["doc_id"]) <= keep_ids
    # strictly fewer than kept (dedup removed at least one) but non-empty
    assert 0 < len(out) <= len(keep_ids)
    # band/score columns agree with the standalone curriculum on the
    # surviving subset's own distribution (bands monotone in score)
    g = out.groupby("band")["score"].agg(["min", "max"]).sort_index()
    assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
    # full-corpus curriculum assigns every surviving doc too
    full = curriculum_order(SF).to_pandas()
    assert set(out["doc_id"]) <= set(full["doc_id"])


def test_token_budget_select_apportionment(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.trainset import (
        token_budget_select)

    B = 20_000
    got = token_budget_select(SF, budget_tokens=B).to_pandas()
    # never exceeds the global budget; each source's cum stays under its
    # (implied) allocation and is a doc_id-ordered prefix
    assert got["cum_tokens"].groupby(got["source"]).max().sum() <= B
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()
    docs["n"] = docs["text"].fillna("").str.split().str.len()
    for src, g in got.groupby("source"):
        g = g.sort_values("doc_id")
        d = docs[docs["source"] == src].sort_values("doc_id")
        # prefix property: selected ids are exactly the first len(g) docs
        assert g["doc_id"].tolist() == d["doc_id"].head(len(g)).tolist()
        assert (g["n_tokens"].to_numpy()
                == d["n"].head(len(g)).to_numpy()).all()
        assert (g["cum_tokens"].to_numpy()
                == np.cumsum(g["n_tokens"].to_numpy())).all()
    # Hamilton: total allocation sums exactly to B
    sq = np.sqrt(docs.groupby("source")["n"].sum().sort_index().to_numpy()
                 .astype(np.float64))
    quota = B * sq / sq.sum()
    alloc = np.floor(quota).astype(np.int64)
    alloc_sum_before = alloc.sum()
    assert alloc_sum_before <= B < alloc_sum_before + len(alloc)
