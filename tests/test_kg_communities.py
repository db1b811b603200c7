"""Label-propagation communities over the KG (round-3 batch 7)."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_lpa_matches_unrolled_sql_replay(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        kg_label_propagation_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_label_propagation)

    got = kg_label_propagation(SF, n_iter=3)
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(kg_label_propagation_sql(3)).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_lpa_labels_are_node_ids_and_converge_toward_fewer(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_label_propagation)

    one = kg_label_propagation(SF, n_iter=1)
    three = kg_label_propagation(SF, n_iter=3)
    nodes = set(one["node_id"])
    assert set(one["community"]) <= nodes
    assert set(three["community"]) <= nodes
    # propagation never increases the number of distinct communities
    assert three["community"].nunique() <= one["community"].nunique()


def test_graph_join_partitions_track_cluster_cpus(ray_session):
    """VERDICT r3 #2: iterative-graph joins must size their shuffle to the
    cluster, not a hardcoded constant."""
    import ray

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        auto_partitions)

    cpus = int(ray.cluster_resources()["CPU"])
    assert auto_partitions(None) == max(2, min(16, cpus))
    # explicit request always wins (real-cluster escape hatch)
    assert auto_partitions(48) == 48
    # cap prevents aggregator actors outnumbering CPUs on big boxes
    assert auto_partitions(None, cap=2) == 2
