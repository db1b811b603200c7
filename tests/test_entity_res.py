"""End-to-end entity resolution (fuzzy blocking → CC → canonical)."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_entity_resolution_matches_sql_chain(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        entity_resolution_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.entity_res import (
        entity_resolution)

    got = entity_resolution(SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF}/part.parquet')")
    want = con.execute(entity_resolution_sql("p_name", "part")).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_entity_resolution_invariants(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.entity_res import (
        entity_resolution)

    got = entity_resolution(SF)
    # every form resolves; canonical forms are themselves forms
    forms = set(got["form"])
    assert set(got["canonical"]) <= forms
    assert got["form"].is_unique
    # a canonical form resolves to itself (idempotence)
    canon_rows = got[got["form"].isin(set(got["canonical"]))]
    self_map = canon_rows[canon_rows["form"] == canon_rows["canonical"]]
    assert set(self_map["form"]) == set(got["canonical"])
    # at least one non-trivial fuzzy cluster exists in the part names
    assert (got["cluster_size"] > 1).any()
