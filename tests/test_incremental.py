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
    # scorecard via the STORED mergeable partials (d1 seeds the store, d2
    # folds only its own partials in) == full-build scorecard
    pd.testing.assert_frame_equal(
        _canon(f"{inc_dir}/scorecard/scorecard.parquet"),
        _canon(f"{full_dir}/scorecard/scorecard.parquet"))


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


def test_delta_name_collision_fails_fast(ray_session, tmp_path):
    """ADVICE r2: reusing a delta_name for different data must raise, not
    silently double-count the old delta into the aggregates."""
    import pytest

    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import incremental_update
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    out = str(tmp_path / "kg")
    build_kg_from_corpus(lambda: _corpus(0, 200), out, fingerprint="b")
    incremental_update(out, _corpus(200, 300), delta_name="day1",
                       fingerprint="fp_day1")
    # same name, different content fingerprint → refuse
    with pytest.raises(ValueError, match="delta names must be unique"):
        incremental_update(out, _corpus(300, 400), delta_name="day1",
                           fingerprint="fp_day2")
    # same name, NO fingerprint (unverifiable) → refuse
    with pytest.raises(ValueError):
        incremental_update(out, _corpus(300, 400), delta_name="day1")


def test_incremental_reapply_is_idempotent(ray_session, tmp_path):
    """Re-running a fully-applied delta (same name + fingerprint) is a
    no-op — aggregates unchanged, no double-count."""
    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import incremental_update
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    out = str(tmp_path / "kg")
    build_kg_from_corpus(lambda: _corpus(0, 200), out, fingerprint="b")
    incremental_update(out, _corpus(200, 300), delta_name="day1",
                       fingerprint="fp1")
    before = {n: _canon(f"{out}/{n}") for n in ("nodes", "edges")}
    stats = incremental_update(out, _corpus(200, 300), delta_name="day1",
                               fingerprint="fp1")
    assert stats.get("skipped") is True
    for n in ("nodes", "edges"):
        pd.testing.assert_frame_equal(_canon(f"{out}/{n}"), before[n])


def test_incremental_crash_resume_no_double_apply(ray_session, tmp_path):
    """A crash between the delta write and the aggregate rewrite must be
    recoverable by re-running the same call — the delta phases skip via
    their manifests and the merge applies exactly once."""
    import pytest

    import amharic_ecommerce_data_extractor_ray.pipelines.incremental as inc
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    full = str(tmp_path / "full")
    out = str(tmp_path / "kg")
    build_kg_from_corpus(lambda: _corpus(0, 300), full, fingerprint="f")
    build_kg_from_corpus(lambda: _corpus(0, 200), out, fingerprint="b")

    real = inc._rewrite_aggregate
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash before aggregate rewrite")

    inc._rewrite_aggregate = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            inc.incremental_update(out, _corpus(200, 300), delta_name="d1",
                                   fingerprint="fp1")
    finally:
        inc._rewrite_aggregate = real
    assert calls["n"] == 1

    # rerun: delta message/triples phases skip (manifests), merge completes
    stats = inc.incremental_update(out, _corpus(200, 300), delta_name="d1",
                                   fingerprint="fp1")
    assert stats["delta_messages"] == 100
    for n in ("nodes", "edges"):
        pd.testing.assert_frame_equal(_canon(f"{out}/{n}"),
                                      _canon(f"{full}/{n}"))


def test_build_kg_refuses_over_incremental_output(ray_session, tmp_path):
    """ADVICE r2: a full rebuild over an out_dir with merged deltas would
    silently discard them from nodes/edges — it must refuse instead."""
    import pytest

    from amharic_ecommerce_data_extractor_ray.pipelines.incremental import incremental_update
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg_from_corpus

    out = str(tmp_path / "kg")
    build_kg_from_corpus(lambda: _corpus(0, 200), out, fingerprint="b")
    incremental_update(out, _corpus(200, 300), delta_name="day1",
                       fingerprint="fp1")
    with pytest.raises(ValueError, match="incremental deltas"):
        build_kg_from_corpus(lambda: _corpus(0, 300), out, fingerprint="x")


def test_crash_before_scorecard_repairs_on_rerun(ray_session, tmp_path,
                                                 monkeypatch):
    """r5 review finding: a crash AFTER the nodes/edges rewrite (which
    records the delta as applied) but BEFORE the scorecard-partials fold
    must not drop the delta from the scorecard forever — the idempotent
    re-run repairs it."""
    import pytest

    import amharic_ecommerce_data_extractor_ray.pipelines.incremental as inc
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        build_kg_from_corpus)

    full_dir = str(tmp_path / "full")
    out = str(tmp_path / "inc")
    build_kg_from_corpus(lambda: _corpus(0, 300), full_dir, fingerprint="f")
    build_kg_from_corpus(lambda: _corpus(0, 200), out, fingerprint="b")

    real = inc._refresh_scorecard_partials

    def boom(*a, **k):
        raise RuntimeError("simulated crash before scorecard fold")

    monkeypatch.setattr(inc, "_refresh_scorecard_partials", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        inc.incremental_update(out, _corpus(200, 300), delta_name="d1",
                               fingerprint="fp-d1")
    monkeypatch.setattr(inc, "_refresh_scorecard_partials", real)

    stats = inc.incremental_update(out, _corpus(200, 300), delta_name="d1",
                                   fingerprint="fp-d1")
    assert stats.get("skipped") is True
    pd.testing.assert_frame_equal(
        _canon(f"{out}/scorecard/scorecard.parquet"),
        _canon(f"{full_dir}/scorecard/scorecard.parquet"))
