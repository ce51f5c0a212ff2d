"""Columnar table store: Lance when available, partitioned Parquet otherwise.

The north rule stores tables as Lance datasets; this container has no
``lance`` wheel, so the same API transparently writes a directory of Parquet
part files instead (identical layout guarantees: one directory per logical
table, many part files, atomic-rename commit). Every write goes to a temp
dir first and is renamed into place so readers never see partial tables —
the 'resumable output' contract.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

try:  # pragma: no cover - lance absent in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_dataset(ds: rd.Dataset, uri: str, *, min_rows_per_file: int | None = None) -> str:
    """Write a Ray Dataset to ``uri`` (directory), atomically."""
    tmp = f"{uri}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)  # an empty dataset writes no files; the
    # directory must still commit so readers see "0 rows", not "missing"
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(tmp)
    else:
        kwargs = {}
        if min_rows_per_file:
            kwargs["min_rows_per_file"] = min_rows_per_file
        ds.write_parquet(tmp, **kwargs)
    if os.path.exists(uri):
        shutil.rmtree(uri)
    os.rename(tmp, uri)
    return uri


def write_table(tbl: pa.Table, uri: str) -> str:
    """Write one Arrow table (small/driver-side) to ``uri`` atomically."""
    tmp = f"{uri}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    if HAVE_LANCE:  # pragma: no cover
        import lance

        lance.write_dataset(tbl, tmp)
    else:
        pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(uri):
        shutil.rmtree(uri)
    os.rename(tmp, uri)
    return uri


def read_dataset(
    uri: str, *, columns: list[str] | None = None, override_num_blocks: int | None = None
) -> rd.Dataset:
    if HAVE_LANCE and os.path.exists(os.path.join(uri, "_versions")):  # pragma: no cover
        return rd.read_lance(uri, columns=columns)
    kwargs = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    return rd.read_parquet(uri, columns=columns, **kwargs)


def read_arrow(uri: str, *, columns: list[str] | None = None) -> pa.Table:
    if HAVE_LANCE and os.path.exists(os.path.join(uri, "_versions")):  # pragma: no cover
        import lance

        return lance.dataset(uri).to_table(columns=columns)
    paths = sorted(
        os.path.join(uri, f) for f in os.listdir(uri) if f.endswith(".parquet")
    )
    if not paths:
        raise FileNotFoundError(f"no parquet parts under {uri}")
    return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])


def append_part(tbl: pa.Table, uri: str, tag: str = "") -> str:
    """Append one part file to a table directory (used by in-task sinks).
    Part files are uniquely named; completeness is recorded by the caller's
    manifest, and readers of incomplete generations ignore the directory."""
    os.makedirs(uri, exist_ok=True)
    name = f"part-{tag + '-' if tag else ''}{uuid.uuid4().hex}.parquet"
    path = os.path.join(uri, name)
    pq.write_table(tbl, path)
    return path


def write_delimited(tbl: pa.Table, dest_dir: str, table: str, delimiter: str = ",") -> str:
    """Delimiter-text export with the reference datafile sink's value
    contract (pipelines_datafile.py:62-100): str() every value, strip the
    delimiter and newlines FROM values, one header line, one line per row.
    Returns the written path."""
    os.makedirs(dest_dir, exist_ok=True)
    path = os.path.join(dest_dir, f"{table}.txt")
    cols = tbl.column_names
    with open(path, "w", encoding="utf-8") as f:
        f.write(delimiter.join(cols) + "\n")
        for batch in tbl.to_batches():
            for row in batch.to_pylist():
                f.write(
                    delimiter.join(
                        str(row[c]).replace(delimiter, "").replace("\n", "")
                        for c in cols
                    )
                    + "\n"
                )
    return path
