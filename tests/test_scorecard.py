"""Scorecard: FIXTURES.md §6 golden fixture (notebook-03 semantics) computed
through the real partial-aggregate → merge → finalize path."""

import datetime as dt
import math

import pandas as pd
import pyarrow as pa
import pytest

from amharic_ecommerce_data_extractor_ray.stages.scorecard import (finalize_scorecard,
                                                 merge_partials_group,
                                                 scorecard_partials_batch)

FIXTURE_ROWS = [
    # vendor, date, views, products, prices, message_id
    ("repoA", dt.date(2024, 1, 1), 100, ["laptop"], [25000.0], 0),
    ("repoA", dt.date(2024, 1, 8), 300, ["blender"], [550.0], 1),
    ("repoA", dt.date(2024, 1, 15), 200, [], [], 2),
    ("repoB", dt.date(2024, 1, 1), 50, ["watch"], [500.0], 3),
    ("repoB", dt.date(2024, 1, 2), 80, ["phone"], [2500.0], 4),
    ("repoC", dt.date(2024, 1, 10), 1000, ["stove"], [], 5),
]


def _run(rows, n_splits=1):
    """Push rows through partials (optionally split into several batches to
    prove mergeability) → pandas merge → finalize."""
    chunks = [rows[i::n_splits] for i in range(n_splits)]
    partial_tables = []
    for chunk in chunks:
        if not chunk:
            continue
        batch = pa.table({
            "repo": [r[0] for r in chunk],
            "views": pa.array([r[2] for r in chunk], pa.int64()),
            "message_date": pa.array([r[1] for r in chunk], pa.date32()),
            "message_id": pa.array([r[5] for r in chunk], pa.int64()),
            "products": pa.array([r[3] for r in chunk], pa.list_(pa.string())),
            "all_numerical_prices": pa.array([r[4] for r in chunk],
                                             pa.list_(pa.float64())),
        })
        partial_tables.append(scorecard_partials_batch(batch).to_pandas())
    partials = pd.concat(partial_tables, ignore_index=True)
    merged = pd.concat([merge_partials_group(g)
                        for _, g in partials.groupby("repo")], ignore_index=True)
    return finalize_scorecard(merged)


@pytest.mark.parametrize("n_splits", [1, 3])
def test_fixtures_section6_golden(n_splits):
    out = _run(FIXTURE_ROWS, n_splits)
    assert list(out["vendor"]) == ["repoC", "repoB", "repoA"]

    c, b, a = out.iloc[0], out.iloc[1], out.iloc[2]
    assert c["total_posts"] == 1 and c["avg_views_per_post"] == 1000
    assert c["posts_per_week"] == pytest.approx(7.0)
    assert c["avg_price_etb"] == 0.0           # NaN→0 (nb cell 18)
    assert c["top_product"] == "stove"
    assert math.isnan(c["top_product_price"])   # NaN preserved in display col
    assert c["lending_score"] == pytest.approx(80.0, abs=1e-4)

    assert b["posts_per_week"] == pytest.approx(7.0)
    assert b["avg_price_etb"] == pytest.approx(1500.0)
    assert b["top_product"] == "phone"
    assert b["top_product_price"] == pytest.approx(2500.0)
    assert b["lending_score"] == pytest.approx(42.3483, abs=1e-4)

    assert a["posts_per_week"] == pytest.approx(1.4)
    assert a["avg_price_etb"] == pytest.approx(12775.0)
    assert a["top_product"] == "blender"
    assert a["top_product_price"] == pytest.approx(550.0)
    assert a["lending_score"] == pytest.approx(25.7754, abs=1e-4)


def test_tie_break_lowest_message_id():
    rows = [
        ("v", dt.date(2024, 1, 1), 100, ["first"], [1.0], 10),
        ("v", dt.date(2024, 1, 2), 100, ["second"], [2.0], 5),
    ]
    out = _run(rows)
    assert out.iloc[0]["top_product"] == "second"  # same views, lower id wins


def test_single_post_vendor_ppw_is_seven():
    # range = 1 day → ppw = 1/(1/7) = 7 (nb fallback path not triggered)
    out = _run([("v", dt.date(2024, 3, 3), 10, [], [], 0)])
    assert out.iloc[0]["posts_per_week"] == pytest.approx(7.0)
    assert out.iloc[0]["date_range_days"] == 1


def _rowloop_partials_reference(batch: pa.Table) -> pa.Table:
    """The retired per-row dict-loop partial kernel (pre-round-3), kept here
    verbatim as the differential reference for the Arrow group_by kernel."""
    from amharic_ecommerce_data_extractor_ray.stages.scorecard import _PARTIAL_SCHEMA
    repos = batch["repo"].to_pylist()
    views = batch["views"].to_pylist()
    dates = batch["message_date"].to_pylist()
    mids = batch["message_id"].to_pylist()
    products = batch["products"].to_pylist()
    prices = batch["all_numerical_prices"].to_pylist()
    acc = {}
    for repo, v, d, mid, prods, prs in zip(repos, views, dates, mids,
                                           products, prices):
        a = acc.get(repo)
        if a is None:
            a = acc[repo] = {"n": 0, "sv": 0, "mind": d, "maxd": d,
                             "sp": 0.0, "np": 0, "bv": None, "bmid": None,
                             "bprod": None, "bprice": None}
        a["n"] += 1
        a["sv"] += v
        if d < a["mind"]:
            a["mind"] = d
        if d > a["maxd"]:
            a["maxd"] = d
        for p in prs:
            a["sp"] += p
            a["np"] += 1
        if a["bv"] is None or v > a["bv"] or (v == a["bv"] and mid < a["bmid"]):
            a["bv"], a["bmid"] = v, mid
            a["bprod"] = prods[0] if prods else None
            a["bprice"] = prs[0] if prs else None
    keys = sorted(acc)
    return pa.table({
        "repo": keys,
        "n_posts": [acc[k]["n"] for k in keys],
        "sum_views": [acc[k]["sv"] for k in keys],
        "min_date": [acc[k]["mind"] for k in keys],
        "max_date": [acc[k]["maxd"] for k in keys],
        "sum_price": [acc[k]["sp"] for k in keys],
        "n_price": [acc[k]["np"] for k in keys],
        "best_views": [acc[k]["bv"] for k in keys],
        "best_mid": [acc[k]["bmid"] for k in keys],
        "best_product": [acc[k]["bprod"] for k in keys],
        "best_price": [acc[k]["bprice"] for k in keys],
    }, schema=_PARTIAL_SCHEMA)


def test_arrow_partials_match_rowloop(ray_session):
    """Differential: vectorized Arrow group_by partial kernel ≡ the retired
    row-loop kernel on real corpus entities (sum_price approx — float
    accumulation order differs, everything else exact)."""
    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.enrich import fused_entities_batch

    tbl = fused_entities_batch(
        pa.table(kg.corpus_ds("/root/testdata/sf0.001")
                 .take_batch(400, batch_format="pyarrow")))
    new = scorecard_partials_batch(tbl).to_pandas()
    ref = _rowloop_partials_reference(tbl).to_pandas()
    assert list(new.columns) == list(ref.columns)
    assert len(new) == len(ref)
    for col in new.columns:
        if col == "sum_price":
            assert new[col].to_numpy() == pytest.approx(ref[col].to_numpy())
        else:
            pd.testing.assert_series_equal(new[col], ref[col], check_names=False)


def test_partials_empty_batch():
    from amharic_ecommerce_data_extractor_ray.stages.scorecard import _PARTIAL_SCHEMA
    empty = pa.table({
        "repo": pa.array([], pa.string()),
        "views": pa.array([], pa.int64()),
        "message_date": pa.array([], pa.date32()),
        "message_id": pa.array([], pa.int64()),
        "products": pa.array([], pa.list_(pa.string())),
        "all_numerical_prices": pa.array([], pa.list_(pa.float64())),
    })
    out = scorecard_partials_batch(empty)
    assert out.num_rows == 0 and out.schema == _PARTIAL_SCHEMA


def test_fused_scorecard_partials_match_staged(ray_session):
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.enrich import fused_entities_batch
    from amharic_ecommerce_data_extractor_ray.stages.scorecard import (
        fused_scorecard_partials_batch, scorecard_partials_batch)

    tbl = pa.table(kg.corpus_ds("/root/testdata/sf0.001")
                   .take_batch(300, batch_format="pyarrow"))
    staged = scorecard_partials_batch(fused_entities_batch(tbl))
    fused = fused_scorecard_partials_batch(tbl)
    assert fused.equals(staged)
