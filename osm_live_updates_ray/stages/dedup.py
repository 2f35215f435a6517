"""Last-version dedup of a change window (reference O1).

The reference merges N change files and keeps, per (type, id), the
first row under the ordering (type, id asc, version DESC, deleted
DESC, timestamp DESC) — i.e. the newest version wins, a delete beats a
non-delete at equal version, latest timestamp breaks remaining ties
(reference: include/osm/OsmFileHelper.h:42-55
``object_order_type_id_reverse_version_delete`` +
``std::unique_copy(..., object_equal_type_id())`` at :99).

Ray Data realization: exact dedup = per-batch partial dedup (combiner)
inside ``map_batches``, then a hash-shuffle ``groupby`` with a
keep-best ``map_groups``.  The partial pass makes the shuffle move at
most one row per (type, id) per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_TYPE_CODE = {"node": 0, "way": 1, "relation": 2}


def _keep_best(df: pd.DataFrame) -> pd.DataFrame:
    """Keep the winning row per (type, id) under the reference order."""
    df = df.assign(
        _del=(df["action"] == "delete").astype(np.int8),
        _seq=df["seq"].fillna(0),
    )
    df = df.sort_values(
        by=["type", "id", "version", "_del", "ts", "_seq"],
        ascending=[True, True, False, False, False, False],
        kind="stable",
    )
    df = df.drop_duplicates(subset=["type", "id"], keep="first")
    return df.drop(columns=["_del", "_seq"])


def dedup_table(changes: pa.Table) -> pa.Table:
    """In-memory dedup (delta batches are small; the reference holds the
    whole window in driver memory too)."""
    schema = changes.schema
    df = changes.to_pandas(types_mapper=None)
    out = _keep_best(df)
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def dedup_dataset(ds):
    """Streaming dedup for large backfill windows.

    groupby key = (type_code << 48) | id packed into one int64 so the
    shuffle hashes a single fixed-width column.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = dedup_table(batch)
        codes = np.array(
            [_TYPE_CODE[x] for x in t.column("type").to_pylist()], dtype=np.int64
        )
        ids = t.column("id").to_numpy(zero_copy_only=False)
        key = (codes << np.int64(48)) | ids
        return t.append_column("_gkey", pa.array(key))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return _keep_best(df).drop(columns=["_gkey"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_gkey")
        .map_groups(finalize, batch_format="pandas")
    )
