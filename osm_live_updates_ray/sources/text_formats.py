"""JSONL / CSV ingestion for the documents corpus.

A webtext pipeline's raw inputs are rarely parquet — crawl dumps ship
as JSONL (one object per line) and tabular exports as CSV.  These
wrappers put both behind the SAME schema contract as
``read_parquet(documents.parquet)`` so every downstream operator
(dedup, quality, embed, mix) is source-format-agnostic: ingest is a
schema cast at the read, not a per-operator concern.

Scale notes: both readers are Ray Data native (parallel file splits,
streaming blocks); schema enforcement happens per batch as an Arrow
cast (zero-copy where types already match).  Column pruning pushes
into the JSON/CSV parse via the reader's projection arguments.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

#: the documents contract every reader normalizes to
DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def _normalize(t: pa.Table, columns: list[str] | None) -> pa.Table:
    want = [f for f in DOCUMENTS_SCHEMA
            if columns is None or f.name in columns]
    arrays = []
    for f in want:
        if f.name not in t.column_names:
            raise ValueError(
                f"documents input missing required column {f.name!r} "
                f"(have {t.column_names})"
            )
        arrays.append(t.column(f.name).cast(f.type))
    return pa.table(dict(zip([f.name for f in want], arrays)))


def read_documents_jsonl(path: str, columns: list[str] | None = None):
    """documents from JSONL files (a file or directory): Ray's native
    parallel JSON reader, then a per-batch cast onto the contract."""
    import ray.data as rd

    ds = rd.read_json(path)
    return ds.map_batches(
        lambda t: _normalize(t, columns), batch_format="pyarrow"
    )


def read_documents_csv(path: str, columns: list[str] | None = None):
    """documents from CSV files: header row required; the parse itself
    prunes to the requested columns (convert_options), the cast
    enforces the contract."""
    import ray.data as rd

    conv = pacsv.ConvertOptions(
        include_columns=[
            f.name for f in DOCUMENTS_SCHEMA
            if columns is None or f.name in columns
        ],
        column_types={f.name: f.type for f in DOCUMENTS_SCHEMA},
    )
    ds = rd.read_csv(path, convert_options=conv)
    return ds.map_batches(
        lambda t: _normalize(t, columns), batch_format="pyarrow"
    )
