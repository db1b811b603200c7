"""ORC / Feather datasource+datasink coverage (sources/columnar.py)."""

import os

import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
COLS = ["doc_id", "text", "lang", "source"]


def _want():
    return (pq.read_table(DOCS, columns=COLS).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


@pytest.mark.parametrize("fmt", ["orc", "feather"])
def test_roundtrip_preserves_bytes(ray_session, tmp_path, fmt):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.sources import columnar

    out = str(tmp_path / fmt)
    writer = getattr(columnar, f"write_{fmt}")
    reader = getattr(columnar, f"read_{fmt}")
    writer(rd.read_parquet(DOCS, columns=COLS), out)
    # distributed write: one file per block, correct extension
    files = os.listdir(out)
    assert files and all(f.endswith("." + fmt) for f in files)
    got = (reader(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(_want())


@pytest.mark.parametrize("fmt", ["orc", "feather"])
def test_column_pruning_on_read(ray_session, tmp_path, fmt):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.sources import columnar

    out = str(tmp_path / fmt)
    getattr(columnar, f"write_{fmt}")(rd.read_parquet(DOCS, columns=COLS),
                                      out)
    got = getattr(columnar, f"read_{fmt}")(out, columns=["doc_id"])
    pdf = got.to_pandas()
    assert list(pdf.columns) == ["doc_id"]
    assert sorted(pdf["doc_id"]) == sorted(_want()["doc_id"])


def test_orc_multi_stripe_read(ray_session, tmp_path):
    """A file with several stripes yields one block per stripe (the unit of
    read parallelism the 100 TB path depends on)."""
    import pyarrow as pa
    import pyarrow.orc as orc

    from amharic_ecommerce_data_extractor_ray.sources.columnar import read_orc

    t = pa.table({"x": list(range(10_000))})
    path = str(tmp_path / "multi.orc")
    orc.write_table(t, path, stripe_size=16 * 1024)
    assert orc.ORCFile(path).nstripes > 1
    ds = read_orc(path)
    assert sorted(ds.to_pandas()["x"]) == list(range(10_000))


def test_registry_dispatch(ray_session, tmp_path):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.sources.columnar import (
        write_feather, write_orc)
    from amharic_ecommerce_data_extractor_ray.sources.readers import read_any

    src = rd.read_parquet(DOCS, columns=COLS)
    write_orc(src, str(tmp_path / "d_orc"))
    write_feather(src, str(tmp_path / "d_feather"))
    orc_file = next((tmp_path / "d_orc").glob("*.orc"))
    fea_file = next((tmp_path / "d_feather").glob("*.feather"))
    assert read_any(str(orc_file)).count() > 0
    assert read_any(str(fea_file)).count() > 0
