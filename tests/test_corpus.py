"""Corpus generator: determinism, skew, schema, SQL-reproducible derivations."""

import hashlib

import numpy as np

from amharic_ecommerce_data_extractor_ray.sources.corpus import (CORPUS_SCHEMA, N_TEMPLATES,
                                                TEMPLATES, corpus_batch)


def test_deterministic_and_schema():
    ids = np.arange(100)
    t1, t2 = corpus_batch(ids), corpus_batch(ids)
    assert t1.equals(t2)
    assert t1.schema.equals(CORPUS_SCHEMA)


def test_mega_vendor_skew():
    t = corpus_batch(np.arange(10000))
    repos = t["repo"].to_pylist()
    assert repos.count("vendor_000") / len(repos) >= 0.3


def test_commit_is_sha256_of_doc_id():
    t = corpus_batch(np.array([5]))
    assert t["commit"][0].as_py() == hashlib.sha256(b"5").hexdigest()


def test_content_cycles_templates():
    t = corpus_batch(np.arange(2 * N_TEMPLATES))
    contents = t["content"].to_pylist()
    assert contents[:N_TEMPLATES] == TEMPLATES
    assert contents[N_TEMPLATES:] == TEMPLATES


def test_views_and_dates_are_doc_id_arithmetic():
    t = corpus_batch(np.array([7]))
    assert t["views"][0].as_py() == (7 * 9973 + 12345) % 5000
    import datetime
    assert t["message_date"][0].as_py() == (
        datetime.date(2024, 1, 1) + datetime.timedelta(days=(7 * 37) % 365))
