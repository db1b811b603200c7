"""Benchmark n-gram contamination scan: membership semantics + broadcast
probe correctness."""


def test_contamination_counts_distinct_overlapping_grams(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.contamination import (
        ngram_contamination)

    docs = rd.from_items([
        {"doc_id": 0, "text": "a b c d e"},        # benchmark doc
        {"doc_id": 1, "text": "a b c x y"},        # shares exactly 'a b c'
        {"doc_id": 2, "text": "p q r s t"},        # shares nothing
        {"doc_id": 3, "text": "a b c d e a b c d e"},  # all grams in bench
    ], override_num_blocks=2)
    bench = docs.filter(lambda r: r["doc_id"] == 0)
    out = (ngram_contamination(docs, bench, n=3, flag_threshold=3)
           .to_pandas().set_index("doc_id"))
    # doc 0: its own 3 distinct grams all hit
    assert out.loc[0, "n_hit"] == 3 and bool(out.loc[0, "contaminated"])
    # doc 1: only 'a b c'
    assert out.loc[1, "n_hit"] == 1 and not bool(out.loc[1, "contaminated"])
    # doc 2: no row (zero hits are not emitted)
    assert 2 not in out.index
    # doc 3: grams {a b c, b c d, c d e, d e a, e a b} → 3 distinct in bench
    assert out.loc[3, "n_hit"] == 3


def test_contamination_short_docs_skipped(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.contamination import (
        ngram_contamination)

    docs = rd.from_items([{"doc_id": 0, "text": "a b"},
                          {"doc_id": 1, "text": ""}])
    out = ngram_contamination(docs, docs, n=3).to_pandas()
    assert len(out) == 0
