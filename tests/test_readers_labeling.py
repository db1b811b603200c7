"""Source registry (S3/S4) and labeling pipelines (S8-S10, M14/M15)."""

import os
import zipfile

import pytest

from amharic_ecommerce_data_extractor_ray.sources.conll import read_conll
from amharic_ecommerce_data_extractor_ray.sources.readers import get_reader, read_zip_of_csvs


def test_get_reader_dispatch():
    assert get_reader(".csv").__name__ == "_read_csv"
    assert get_reader("parquet").__name__ == "_read_parquet"
    assert get_reader(".zip") is read_zip_of_csvs
    with pytest.raises(ValueError, match="No reader registered"):
        get_reader(".xyz")


def test_zip_of_csvs_union_all(ray_session, tmp_path):
    for i in (1, 2):
        with open(tmp_path / f"part{i}.csv", "w") as f:
            f.write("a,b\n")
            for j in range(5):
                f.write(f"{i},{j}\n")
    zpath = str(tmp_path / "data.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(tmp_path / "part1.csv", "part1.csv")
        zf.write(tmp_path / "part2.csv", "part2.csv")
    ds = read_zip_of_csvs(zpath, extract_dir=str(tmp_path / "x"))
    df = ds.to_pandas()
    assert len(df) == 10
    assert sorted(df["a"].unique()) == [1, 2]


def test_zip_without_csvs_raises(tmp_path):
    zpath = str(tmp_path / "empty.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("readme.txt", "hi")
    with pytest.raises(ValueError, match="no CSV files"):
        read_zip_of_csvs(zpath)


def test_prepare_labeling_sheet(ray_session, tmp_path):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.labeling import prepare_labeling_sheet

    ds = rd.from_items([{"content": "ዋጋ 550 ብር"}, {"content": ""},
                        {"content": "Dell laptop"}])
    out = str(tmp_path / "sheet.conll")
    n = prepare_labeling_sheet(ds, out, num_messages=3)
    assert n == 2  # empty message skipped
    sents = read_conll(out)
    assert all(lab == "O" for s in sents for _, lab in s)
    assert [t for t, _ in sents[0]] == ["ዋጋ", "550", "ብር"]


def test_pseudo_label_to_conll(ray_session, tmp_path):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.labeling import pseudo_label_to_conll

    ds = rd.from_items([{"content": "ዋጋ፦550ብር መገናኛ ዛም ሞል portable blender electric"}])
    out = str(tmp_path / "pl.conll")
    n = pseudo_label_to_conll(ds, out)
    assert n == 1
    # FIXTURES.md §4 golden
    assert read_conll(out)[0] == [
        ("ዋጋ", "B-PRICE"), (":", "O"), ("550", "B-PRICE"), ("ብር", "I-PRICE"),
        ("መገናኛ", "B-LOC"), ("ዛም", "O"), ("ሞል", "B-LOC"),
        ("portable", "B-PRODUCT"), ("blender", "I-PRODUCT"),
        ("electric", "I-PRODUCT")]


def test_coerce_schema_batch(ray_session):
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.sources.readers import coerce_schema_batch

    t = pa.table({
        "message_id": pa.array([1, None, 3], pa.int64()),
        "content": pa.array(["a", None, "c"], pa.string()),
        "views": pa.array(["10", "x", None], pa.string()),
        "message_date": pa.array(["2024-01-02", "bogus", None], pa.string()),
    })
    out = coerce_schema_batch(t)
    assert out.num_rows == 2  # null key dropped
    assert out["content"].to_pylist() == ["a", "c"]
    assert out["views"].to_pylist() == [10, 0]
    import datetime as dt

    assert out["message_date"].to_pylist() == [dt.date(2024, 1, 2), None]


def test_seeded_split_deterministic(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.evalharness import split_corpus

    items = [{"sentence_id": i} for i in range(100)]
    a_train, a_test = split_corpus(rd.from_items(items))
    b_train, b_test = split_corpus(rd.from_items(items))
    a_ids = sorted(r["sentence_id"] for r in a_test.take_all())
    b_ids = sorted(r["sentence_id"] for r in b_test.take_all())
    assert len(a_ids) == 20
    assert a_ids == b_ids  # same seed → same split


def test_compact_parquet_round_trip(ray_session):
    import os
    import tempfile

    import pandas as pd

    from amharic_ecommerce_data_extractor_ray.sources.readers import compact_parquet

    out = tempfile.mkdtemp()
    ds = compact_parquet("/root/testdata/sf0.001/documents.parquet", out,
                         target_rows_per_file=100)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 5  # 500 rows / 100 per file
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
