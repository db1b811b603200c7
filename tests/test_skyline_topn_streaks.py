"""Round-3 batch 8b: skyline (Pareto frontier), top-N per group, and
gaps-and-islands streaks — each vs its DuckDB oracle plus shape-specific
property checks."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _vs_oracle(con, got, sql, sort_cols):
    want = (con.execute(sql).df()
            .sort_values(sort_cols).reset_index(drop=True))
    got = got.sort_values(sort_cols).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert (got[c] - want[c]).abs().max() < 1e-9, c
        else:
            assert got[c].equals(want[c]), c


def test_skyline_matches_oracle(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import part_skyline_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_skyline)

    got = part_skyline(SF)
    _vs_oracle(con, got, part_skyline_sql(), ["p_partkey"])


def test_skyline_no_internal_dominance(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_skyline)

    got = part_skyline(SF)
    q = got["total_qty"].to_numpy()
    c = got["min_price"].to_numpy()
    for i in range(len(got)):
        dom = (q >= q[i]) & (c <= c[i]) & ((q > q[i]) | (c < c[i]))
        assert not dom.any(), f"row {i} dominated inside the skyline"


def test_skyline_merge_identity():
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the combiner
    property the distributed plan relies on."""
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_skyline)  # noqa: F401 (import proves the module loads)
    rng = np.random.default_rng(7)
    pts = rng.integers(0, 40, size=(400, 2))

    def sky(p):
        keep = []
        for i in range(len(p)):
            q, c = p[i]
            dom = ((p[:, 0] >= q) & (p[:, 1] <= c)
                   & ((p[:, 0] > q) | (p[:, 1] < c)))
            if not dom.any():
                keep.append(i)
        return p[keep]

    a, b = pts[:200], pts[200:]
    full = {tuple(r) for r in sky(pts)}
    merged = {tuple(r) for r in sky(np.vstack([sky(a), sky(b)]))}
    assert full == merged


def test_topn_per_key(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        topn_orders_per_customer_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        topn_orders_per_customer)

    got = topn_orders_per_customer(SF)
    _vs_oracle(con, got, topn_orders_per_customer_sql(3),
               ["o_custkey", "rnk"])
    # at most n rows per key, ranks contiguous from 1, prices non-increasing
    per = got.groupby("o_custkey")
    assert (per.size() <= 3).all()
    assert (per["rnk"].min() == 1).all()
    assert (per["o_totalprice"].apply(
        lambda s: (s.diff().dropna() <= 1e-9).all())).all()


def test_user_streaks(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import user_streaks_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        user_streaks)

    got = user_streaks(SF)
    _vs_oracle(con, got, user_streaks_sql(), ["user_id"])
    # islands partition the active days
    assert (got["longest"] <= got["active_days"]).all()
    assert (got["n_streaks"] <= got["active_days"]).all()


def test_curriculum_order_bands_partition_by_length(ray_session):
    import numpy as np

    from amharic_ecommerce_data_extractor_ray.pipelines.trainset import (
        curriculum_order)

    df = curriculum_order("/root/testdata/sf0.001", n_bands=8).to_pandas()
    assert len(df) == 500 and df["doc_id"].is_unique
    # bands are monotone in score: max score of band k <= min score of k+1
    g = df.groupby("band")["score"].agg(["min", "max", "count"]).sort_index()
    assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
    # near-equal band sizes up to tie spill: each boundary rank is hit
    n, B = len(df), 8
    cum = g["count"].cumsum().to_numpy()
    for k in range(1, B):
        want_rank = -(-k * n // B)
        # the band containing the boundary rank ends at/after it
        assert cum[k - 1] >= want_rank or g["max"].iloc[k - 1] == g["min"].iloc[k - 1]
    # shuffle key is the pinned md5 fold
    import hashlib, struct
    r = df.iloc[0]
    h = struct.unpack(
        "<Q", hashlib.md5(str(r["doc_id"]).encode()).digest()[8:16])[0]
    assert r["shuffle_key"] == h % (1 << 63)
