"""Tests for the labeling/eval query surface (bio_tags, labeling_sheet,
conll_csv, corpus_summary) against the executed-reference goldens."""

from amharic_ecommerce_data_extractor_ray import goldens
from amharic_ecommerce_data_extractor_ray.sources.corpus import N_TEMPLATES

SF = "/root/testdata/sf0.001"


def test_bio_tags_match_goldens(ray_session):
    from amharic_ecommerce_data_extractor_ray import entrypoints as ep

    df = ep.q_bio_tags(SF).to_pandas()
    by_msg = {mid: g.sort_values("tok_idx") for mid, g in df.groupby("message_id")}
    for mid in range(500):
        expected = goldens.TAGGED[mid % N_TEMPLATES]
        got = by_msg.get(mid)
        actual = [] if got is None else list(zip(got["token"], got["label"]))
        assert actual == expected, f"message {mid}"


def test_labeling_sheet_first_50_all_O(ray_session):
    from amharic_ecommerce_data_extractor_ray import entrypoints as ep

    df = ep.q_labeling_sheet(SF).to_pandas()
    assert set(df["label"]) == {"O"}
    assert df["message_id"].max() < 50
    n_expected = sum(len(goldens.TOKENS[mid % N_TEMPLATES]) for mid in range(50))
    assert len(df) == n_expected


def test_conll_csv_matches_m14_goldens(ray_session):
    from amharic_ecommerce_data_extractor_ray import entrypoints as ep

    df = ep.q_conll_csv(SF).to_pandas().set_index("message_id")
    for mid in range(500):
        pairs = goldens.M14_TAGGED[mid % N_TEMPLATES]
        if not pairs:
            assert mid not in df.index
            continue
        row = df.loc[mid]
        assert row["message_text"] == " ".join(p[0] for p in pairs)
        assert row["labels_sequence"] == " ".join(p[1] for p in pairs)


def test_corpus_summary_totals(ray_session):
    from amharic_ecommerce_data_extractor_ray import entrypoints as ep

    df = ep.q_corpus_summary(SF).to_pandas()
    assert df["n_posts"].sum() == 500
    # mega-vendor skew: vendor_000 owns 30% of rows (doc_id % 10 < 3)
    mega = df.set_index("repo").loc["vendor_000"]
    assert mega["n_posts"] == 150
    # lang == 'en' when doc_id % 10 == 7 → 50 of 500
    assert df["n_en"].sum() == 50
    # templates 7 and 8 normalize to empty → 2 of every 12
    n_empty_expected = sum(
        1 for mid in range(500) if goldens.NORM[mid % N_TEMPLATES] == "")
    assert df["n_empty_text"].sum() == n_empty_expected
