"""Direct unit tests of joins.exact_fold / exact_map_groups — the
empty-block float64-poisoning class (BASELINE round 5).  The forced layout:
Arrow blocks carrying null-bearing int64 above 2**53 unioned with
schema-less empty pandas blocks (what map_groups/aggregate tasks leak for
group-less partitions); Ray's majority-vote block normalization then drags
the real blocks through pandas unless the shuffle is pinned to Arrow."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

BIG = 12_884_901_891_000_001          # > 2**53, not float64-representable


def _poisoned_ds():
    import ray.data as rd

    arrow = rd.from_arrow(pa.table({
        "node": pa.array([1, 1, 2, 2], pa.int64()),
        "e": pa.array([BIG, None, BIG + 2, BIG + 2], pa.int64()),
        "w": pa.array([1, 1, 1, 1], pa.int64())}))
    empty = rd.from_pandas(pd.DataFrame())   # schema-less pandas block
    return arrow.union(empty, empty, empty, empty)


def test_exact_fold_keeps_big_int64_keys(ray_session):
    from ray.data.aggregate import Sum

    from amharic_ecommerce_data_extractor_ray.stages.joins import exact_fold

    out = (exact_fold(_poisoned_ds(), "e", Sum("w", alias_name="w"))
           .take_batch(10, batch_format="pyarrow"))
    assert out.schema.field("e").type == pa.int64()
    got = {e: w for e, w in zip(out["e"].to_pylist(), out["w"].to_pylist())}
    assert got == {BIG: 1, BIG + 2: 2, None: 1}

    # chained fold over a fold's own (possibly empty-block-bearing) output
    out2 = (exact_fold(exact_fold(_poisoned_ds(), "e",
                                  Sum("w", alias_name="w")),
                       "e", Sum("w", alias_name="w"))
            .take_batch(10, batch_format="pyarrow"))
    assert out2.schema.field("e").type == pa.int64()
    assert set(out2["e"].to_pylist()) == {BIG, BIG + 2, None}


def test_exact_map_groups_groups_arrive_exact(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        exact_map_groups)

    seen = []

    def probe(g: pa.Table) -> pa.Table:
        assert g.schema.field("e").type == pa.int64()
        seen.append(g["e"].to_pylist())
        return g.filter(pc.is_valid(g["e"]))

    out = (exact_map_groups(_poisoned_ds(), "node", probe)
           .take_batch(10, batch_format="pyarrow"))
    assert out.schema.field("e").type == pa.int64()
    assert sorted(out["e"].to_pylist()) == [BIG, BIG + 2, BIG + 2]


def test_exact_map_groups_pandas_format_for_null_free_groups(ray_session):
    """batch_format='pandas' is allowed for group UDFs over null-free
    columns — the pinned Arrow SORT still protects the shuffle, and the
    per-group conversion of null-free int64 stays exact."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        exact_map_groups)

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([BIG, BIG + 1, BIG + 5], pa.int64())})).union(
        rd.from_pandas(pd.DataFrame()))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        assert str(g["v"].dtype) == "int64"
        return g.sort_values("v").head(1)

    out = (exact_map_groups(ds, "k", first, batch_format="pandas")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["v"].tolist() == [BIG, BIG + 5]
