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
    """Arrow/numpy partial aggregation (one row per tile per block):
    argsort + reduceat, no pandas round-trip in the hot stage."""
    if batch.num_rows == 0:
        return pa.Table.from_pydict(
            {
                "tile_id": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
                "n_in_polygon": pa.array([], type=pa.int64()),
                "sum_knn": pa.array([], type=pa.float64()),
                "n_knn": pa.array([], type=pa.int64()),
                "cells": pa.array([], type=pa.list_(pa.int64())),
            }
        )
    tile = batch.column("tile_id").to_numpy(zero_copy_only=False).astype(np.int64)
    cell = batch.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
    poly = batch.column("polygon_id").to_numpy(zero_copy_only=False)
    kd = batch.column("knn_dist").to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((cell, tile))
    tile_s, cell_s = tile[order], cell[order]
    poly_s, kd_s = poly[order], kd[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(tile_s)) + 1])
    counts = np.diff(np.concatenate([starts, [len(tile_s)]]))
    has_kd = ~np.isnan(kd_s)
    # pandas-compatible skipna sum: all-NaN group sums to 0.0
    kd0 = np.where(has_kd, kd_s, 0.0)
    # distinct cells per tile: (tile, cell) runs within the sort
    new_pair = np.ones(len(tile_s), dtype=bool)
    if len(tile_s) > 1:
        new_pair[1:] = (np.diff(tile_s) != 0) | (np.diff(cell_s) != 0)
    pair_tile = tile_s[new_pair]
    pair_cell = cell_s[new_pair]
    p_starts = np.concatenate([[0], np.flatnonzero(np.diff(pair_tile)) + 1])
    p_counts = np.diff(np.concatenate([p_starts, [len(pair_tile)]]))
    cells_col = pa.ListArray.from_arrays(
        pa.array(np.concatenate([p_starts, [len(pair_cell)]]).astype(np.int32)),
        pa.array(pair_cell),
    )
    return pa.Table.from_pydict(
        {
            "tile_id": pa.array(tile_s[starts]),
            "n_pages": pa.array(counts.astype(np.int64)),
            "n_in_polygon": pa.array(
                np.add.reduceat((poly_s >= 0).astype(np.int64), starts)
                if len(starts)
                else np.empty(0, dtype=np.int64)
            ),
            "sum_knn": pa.array(
                np.add.reduceat(kd0, starts)
                if len(starts)
                else np.empty(0)
            ),
            "n_knn": pa.array(
                np.add.reduceat(has_kd.astype(np.int64), starts)
                if len(starts)
                else np.empty(0, dtype=np.int64)
            ),
            "cells": cells_col,
        }
    )


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


CELL_SUMMARY = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("cell_id", pa.int64()),
        # max SQUARED nearest-node distance over the cell's rows;
        # +inf when any row has null knn_dist (any new node beats it)
        ("max_knn_dist", pa.float64()),
        ("n_rows", pa.int64()),
    ]
)


def _cell_summary_arrays(batch: pa.Table):
    cell = batch.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tile = batch.column("tile_id").to_numpy(zero_copy_only=False).astype(np.int64)
    kd = batch.column("knn_dist").to_numpy(zero_copy_only=False).astype(np.float64)
    kd = np.where(np.isnan(kd), np.inf, kd)
    order = np.argsort(cell, kind="stable")
    cell, tile, kd = cell[order], tile[order], kd[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(cell)) + 1])
    counts = np.diff(np.concatenate([starts, [len(cell)]]))
    return (
        tile[starts],
        cell[starts],
        np.maximum.reduceat(kd, starts) if len(kd) else kd,
        counts.astype(np.int64),
    )


def cell_summary_table(assignments: pa.Table) -> pa.Table:
    """Per-cell kNN-bound summary (the delta path's invalidation prune
    index): one row per distinct cell, vectorized reduceat groupby."""
    if assignments.num_rows == 0:
        return CELL_SUMMARY.empty_table()
    tile, cell, mx, n = _cell_summary_arrays(assignments)
    return pa.Table.from_arrays(
        [
            pa.array(tile, type=pa.int64()),
            pa.array(cell, type=pa.int64()),
            pa.array(mx, type=pa.float64()),
            pa.array(n, type=pa.int64()),
        ],
        schema=CELL_SUMMARY,
    )


def cell_summary(assignments_ds):
    """Dataset variant: per-batch partials (one row per cell per block)
    -> small groupby(cell_id) combine.  The shuffle moves cell partials,
    not pages."""
    from ray.data.aggregate import Max, Sum

    def _part(batch: pa.Table) -> pa.Table:
        return cell_summary_table(batch)

    agg = (
        assignments_ds.map_batches(_part, batch_format="pyarrow")
        .groupby("cell_id")
        .aggregate(
            Max("tile_id", alias_name="tile_id"),
            Max("max_knn_dist", alias_name="max_knn_dist"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )
    return agg.map_batches(
        lambda t: t.select([f.name for f in CELL_SUMMARY]).cast(CELL_SUMMARY),
        batch_format="pyarrow",
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
