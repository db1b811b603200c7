"""Incremental KG maintenance: build(A) + incremental(B) must equal
build(A ∪ B) exactly, with only B's content tagged in the increment."""

import numpy as np
import pandas as pd


def _corpus(lo, hi):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.sources.corpus import corpus_batch

    return rd.from_arrow(corpus_batch(np.arange(lo, hi)))


def _canon(path, cols=None):
    df = pd.read_parquet(path)
    if cols:
        df = df[cols]
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_two_sequential_deltas_compose(ray_session, tmp_path):
    """incremental(d1) then incremental(d2) == build of the whole corpus."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import incremental_update
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    full_dir = str(tmp_path / "full2")
    inc_dir = str(tmp_path / "inc2")
    build_kg_from_corpus(lambda: _corpus(0, 400), full_dir, fingerprint="f")
    build_kg_from_corpus(lambda: _corpus(0, 200), inc_dir, fingerprint="b")
    incremental_update(inc_dir, _corpus(200, 300), delta_name="d1")
    incremental_update(inc_dir, _corpus(300, 400), delta_name="d2")
    for name in ("nodes", "edges"):
        pd.testing.assert_frame_equal(_canon(f"{inc_dir}/{name}"),
                                      _canon(f"{full_dir}/{name}"))
    n_inc = (rd.read_parquet(f"{inc_dir}/triples")
             .union(rd.read_parquet(f"{inc_dir}/triples_deltas")).count())
    assert n_inc == rd.read_parquet(f"{full_dir}/triples").count()


def test_incremental_equals_full_rebuild(ray_session, tmp_path):
    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import incremental_update
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")

    build_kg_from_corpus(lambda: _corpus(0, 500), full_dir, fingerprint="full")
    build_kg_from_corpus(lambda: _corpus(0, 300), inc_dir, fingerprint="base")
    stats = incremental_update(inc_dir, _corpus(300, 500), delta_name="d1")
    assert stats["delta_messages"] == 200

    # triples: base partitions + delta dir == full build's triples
    import ray.data as rd

    inc_triples = (rd.read_parquet(f"{inc_dir}/triples")
                   .union(rd.read_parquet(f"{inc_dir}/triples_deltas"))
                   .to_pandas())
    full_triples = rd.read_parquet(f"{full_dir}/triples").to_pandas()
    cols = sorted(full_triples.columns)

    def canon_df(df):
        df = df[cols].astype(str)
        return df.sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon_df(inc_triples),
                                  canon_df(full_triples))

    # nodes / edges / scorecard: merged views == full-build views
    for name in ("nodes", "edges"):
        pd.testing.assert_frame_equal(_canon(f"{inc_dir}/{name}"),
                                      _canon(f"{full_dir}/{name}"))
    pd.testing.assert_frame_equal(
        _canon(f"{inc_dir}/scorecard/scorecard.parquet"),
        _canon(f"{full_dir}/scorecard/scorecard.parquet"))
