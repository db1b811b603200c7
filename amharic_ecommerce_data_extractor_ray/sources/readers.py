"""Source registry — format → Dataset (S3/S4/S5 in SURVEY.md §2.1).

The reference's only formal plugin point is a ``DataIngestor`` ABC dispatched
on file extension (zip_ingestor.py:11-15,106-128).  Here the registry maps an
extension to a ``ray.data.read_*`` reader; multi-file reads are union-all
natively (the pandas ``concat`` at zip_ingestor.py:92 disappears).

Zip-of-CSVs (S3): extract to a temp dir, then one ``read_csv`` over every
member — the reference's extract → per-file read_csv → concat collapses to a
single streaming read.
"""

from __future__ import annotations

import glob
import os
import tempfile
import zipfile


def read_zip_of_csvs(zip_path: str, *, extract_dir: str | None = None):
    """S3: union-all of every ``*.csv`` inside a zip as one Dataset."""
    import ray.data as rd

    if not zipfile.is_zipfile(zip_path):
        raise ValueError(f"not a zip file: {zip_path}")
    out = extract_dir or tempfile.mkdtemp(prefix="zip_ingest_")
    with zipfile.ZipFile(zip_path) as zf:
        members = [m for m in zf.namelist() if m.lower().endswith(".csv")
                   and not m.startswith("__MACOSX")]
        if not members:
            raise ValueError(f"no CSV files found in {zip_path}")
        zf.extractall(out, members=members)
    paths = sorted(glob.glob(os.path.join(out, "**", "*.csv"), recursive=True))
    return rd.read_csv(paths)


def _read_csv(path: str):
    import ray.data as rd

    return rd.read_csv(path)


def _read_parquet(path: str):
    import ray.data as rd

    return rd.read_parquet(path)


def _read_json(path: str):
    import ray.data as rd

    return rd.read_json(path)


def _read_text(path: str):
    import ray.data as rd

    return rd.read_text(path)


def _read_orc(path: str):
    from .columnar import read_orc

    return read_orc(path)


def _read_feather(path: str):
    from .columnar import read_feather

    return read_feather(path)


READERS = {
    ".zip": read_zip_of_csvs,
    ".csv": _read_csv,
    ".parquet": _read_parquet,
    ".json": _read_json,
    ".jsonl": _read_json,
    ".txt": _read_text,
    ".orc": _read_orc,
    ".feather": _read_feather,
    ".arrow": _read_feather,
}


def get_reader(file_extension: str):
    """S4 factory: extension → reader callable; ValueError on unknown (the
    reference raises for unsupported extensions too)."""
    ext = file_extension.lower()
    if not ext.startswith("."):
        ext = "." + ext
    if ext not in READERS:
        raise ValueError(f"No reader registered for extension {ext!r}; "
                         f"known: {sorted(READERS)}")
    return READERS[ext]


def read_any(path: str):
    """Dispatch on the path's extension."""
    _, ext = os.path.splitext(path)
    return get_reader(ext)(path)


def compact_parquet(in_path: str, out_dir: str, *,
                    target_rows_per_file: int = 1_000_000):
    """Parquet compaction — the small-files maintenance pass every petabyte
    table needs: read → repartition to ceil(rows / target) blocks → write.
    Content is byte-preserved (oracle-checked by the ``compact_documents``
    query); only the file layout changes.  Returns the output Dataset."""
    import math

    import ray.data as rd

    ds = rd.read_parquet(in_path)
    n = ds.count()
    width = max(1, math.ceil(n / target_rows_per_file))
    ds.repartition(width).write_parquet(out_dir)
    return rd.read_parquet(out_dir)


def coerce_schema_batch(batch, *, text_cols=("repo", "path", "commit", "lang",
                                             "content"),
                        int_cols=("views",), date_cols=("message_date",),
                        key_col="message_id"):
    """M12/S5 defensive schema coercion as ONE map_batches stage (the
    reference re-coerces per stage with pandas astype/fillna/to_numeric,
    run_pipeline.py:89-99,220-234):

    - text columns → string, null → ""
    - int columns → int64, unparseable/null → 0
    - date columns → date32, unparseable → null (errors='coerce')
    - rows with a null key column are DROPPED (dropna(subset=[key]))
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    t = batch
    if key_col in t.column_names:
        t = t.filter(pc.is_valid(t[key_col]))
    for c in text_cols:
        if c in t.column_names:
            col = pc.cast(t[c], pa.string())
            col = pc.fill_null(col, "")
            t = t.set_column(t.schema.get_field_index(c), c, col)
    for c in int_cols:
        if c in t.column_names:
            try:
                col = pc.cast(t[c], pa.int64())
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                # pc.cast raises different subclasses depending on the source
                # type (ArrowInvalid for bad strings, ArrowNotImplementedError/
                # ArrowTypeError for list/struct) — all fall back to per-value
                # coercion
                vals = []
                for v in t[c].to_pylist():
                    try:
                        vals.append(int(float(v)))
                    except (TypeError, ValueError):
                        vals.append(None)
                col = pa.array(vals, pa.int64())
            col = pc.fill_null(col, 0)
            t = t.set_column(t.schema.get_field_index(c), c, col)
    for c in date_cols:
        if c in t.column_names:
            if pa.types.is_date(t[c].type) or pa.types.is_timestamp(t[c].type):
                continue
            import datetime as dt

            vals = []
            for v in t[c].to_pylist():
                try:
                    vals.append(dt.date.fromisoformat(str(v)[:10]))
                except (TypeError, ValueError):
                    vals.append(None)
            t = t.set_column(t.schema.get_field_index(c), c,
                             pa.array(vals, pa.date32()))
    return t
