"""Tile rollups (A6): raster<->vector tile aggregates over assignments.

A tile is a coarse grid cell (config.tile_res_deg).  The rollup is the
canonical pre-aggregated groupby: per-batch partial aggregation inside
``map_batches`` (one row per tile per block), then a small final
``groupby(tile_id)`` over the partials — the shuffle moves tile
partials, not pages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TILE_ROLLUP = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("n_pages", pa.int64()),
        ("n_in_polygon", pa.int64()),
        ("n_cells", pa.int64()),  # distinct cells with pages in the tile
        ("mean_knn_dist", pa.float64()),
    ]
)


def _partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    g = df.groupby("tile_id", sort=True)
    out = pd.DataFrame(
        {
            "tile_id": np.asarray(list(g.groups.keys()), dtype=np.int64),
            "n_pages": g.size().to_numpy(),
            "n_in_polygon": g.apply(
                lambda x: int((x["polygon_id"] >= 0).sum()), include_groups=False
            ).to_numpy(),
            "sum_knn": g["knn_dist"].sum().to_numpy(),
            "n_knn": g["knn_dist"].count().to_numpy(),
        }
    )
    cells = df.groupby("tile_id")["cell_id"].agg(lambda s: list(set(s)))
    out["cells"] = cells.to_numpy()
    return pa.Table.from_pandas(out, preserve_index=False)


def _finalize(df: pd.DataFrame) -> pd.DataFrame:
    cells: set = set()
    for c in df["cells"]:
        cells.update(c)
    n_knn = df["n_knn"].sum()
    return pd.DataFrame(
        {
            "tile_id": [df["tile_id"].iloc[0]],
            "n_pages": [int(df["n_pages"].sum())],
            "n_in_polygon": [int(df["n_in_polygon"].sum())],
            "n_cells": [len(cells)],
            "mean_knn_dist": [
                float(df["sum_knn"].sum() / n_knn) if n_knn else None
            ],
        }
    )


def tile_rollup(assignments_ds):
    """assignments Dataset -> TILE_ROLLUP Dataset (partial-agg + small
    shuffle)."""
    return (
        assignments_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("tile_id")
        .map_groups(_finalize, batch_format="pandas")
    )


def tile_rollup_table(assignments: pa.Table) -> pa.Table:
    """In-memory variant for tests / small dirty-tile recomputes."""
    df = assignments.to_pandas()
    g = df.groupby("tile_id", sort=True)
    out = pd.DataFrame(
        {
            "tile_id": np.asarray(list(g.groups.keys()), dtype=np.int64),
            "n_pages": g.size().to_numpy().astype(np.int64),
            "n_in_polygon": g.apply(
                lambda x: int((x["polygon_id"] >= 0).sum()), include_groups=False
            ).to_numpy().astype(np.int64),
            "n_cells": g["cell_id"].nunique().to_numpy().astype(np.int64),
            "mean_knn_dist": g["knn_dist"].mean().to_numpy(),
        }
    )
    # all-null knn_dist groups: pandas mean yields NaN, but the
    # bootstrap _finalize stores null — normalize so delta rewrites
    # are byte-compatible with bootstrap output
    mk = out["mean_knn_dist"].to_numpy()
    arr = pa.array(mk, type=pa.float64(), from_pandas=True)
    t = pa.Table.from_pandas(out, preserve_index=False)
    idx = t.schema.get_field_index("mean_knn_dist")
    return t.set_column(idx, "mean_knn_dist", arr).cast(TILE_ROLLUP)
