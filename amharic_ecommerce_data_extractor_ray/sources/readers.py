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


READERS = {
    ".zip": read_zip_of_csvs,
    ".csv": _read_csv,
    ".parquet": _read_parquet,
    ".json": _read_json,
    ".jsonl": _read_json,
    ".txt": _read_text,
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
