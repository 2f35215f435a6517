"""Incremental update pipeline — the engine's flagship.

Replays one OsmChange window against the state store, recomputing ONLY
what the delta dirties (the reference's whole program,
src/osm/OsmUpdater.cpp:90-166 + src/osm/OsmChangeHandler.cpp:60-178):

  dedup (O1) -> classify + J1 (M1/M2) -> dirty cascade (J2/J3)
  -> closure (J4/J5) -> reconstruction (J6)
  -> geometry recompute (ST3)
  -> dirty cells -> re-join pages of dirty cells only
  -> COW tile replacement + rollups + watermark commit.

The reference's node→way→relation cascade extends here to
node→way→relation→cell→tile (north_rule): an object's old and new
envelopes dirty grid cells; only pages in dirty cells are re-joined;
only tiles containing dirty cells are rewritten.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import cells as cellfn
from ..schemas import OSM_NODES, OSM_RELATIONS, OSM_WAYS
from ..stages import geometry, spatial, tiles
from ..stages.dedup import dedup_table
from ..stages.delta import classify, reconstruct
from ..stages.geometry import REL_POLY_OFFSET
from ..state.store import (
    StateStore,
    explode_rel_members,
    explode_way_members,
    pack_gid,
)


def _payload(changes: pa.Table, otype: str, schema: pa.Schema) -> pa.Table:
    """Non-delete delta rows of one type, projected to the state schema."""
    t = changes.filter(
        pc.and_(
            pc.equal(changes.column("type"), otype),
            pc.not_equal(changes.column("action"), "delete"),
        )
    )
    return t.select([f.name for f in schema]).cast(schema)


def _merge_prefer_last(first: pa.Table, last: pa.Table, key: str = "id") -> pa.Table:
    """Concat two tables deduping on key, keeping rows of ``last``."""
    if first.num_rows == 0:
        return last
    if last.num_rows == 0:
        return first
    drop = pa.array(last.column(key).to_numpy(zero_copy_only=False))
    keep = pc.invert(pc.is_in(first.column(key), value_set=drop))
    return pa.concat_tables([first.filter(keep).cast(last.schema), last])


def _ring_cells(rings: pa.Table, res: float) -> np.ndarray:
    """Cells covered by each ring's bbox.

    Assignment dirtiness is driven by POLYGON RINGS (PIP) and nodes
    (kNN) only — never by whole-object envelopes, which for
    continent-spanning relations would enumerate most of the grid.
    Ring bboxes are feature-sized by construction.
    """
    out = []
    for a, b, c, d in zip(
        rings.column("min_lon").to_pylist(),
        rings.column("min_lat").to_pylist(),
        rings.column("max_lon").to_pylist(),
        rings.column("max_lat").to_pylist(),
    ):
        out.append(cellfn.cells_covering_bbox(a, b, c, d, res))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def _candidate_cells(
    store: StateStore,
    pts_lon: np.ndarray,
    pts_lat: np.ndarray,
    env_dirty_cells: np.ndarray,
    cfg: EngineConfig,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(candidate cells, their tiles, exact candidate ROW count) from
    the per-cell kNN-bound summary: a cell can contain a dirty row
    only if it is
    env-dirty, or some delta point (new location of a created/moved
    node, or OLD location of a moved/deleted node) is within the
    cell's stored ``max_knn_dist`` bound:

      * closer-new-node rows satisfy dist² ≤ knn_dist ≤ max_kd(cell),
        and dist² ≥ mindist²(cell_bbox, p)  ⇒  mindist² ≤ max_kd;
      * rows whose nearest node m moved/deleted have
        knn_dist = dist²(page, m_old) ≥ mindist²(cell, m_old), same
        bound with the OLD location — no reverse node→cell index
        needed.

    Scans the summary (one row per CELL, not per page) on the driver —
    the cell-count-sized computation that replaced the full-table
    invalidation scan.
    """
    res = cfg.cell_res_deg
    t = store.read_all_hot("cell_summaries")
    cell = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tile = t.column("tile_id").to_numpy(zero_copy_only=False).astype(np.int64)
    kd = t.column("max_knn_dist").to_numpy(zero_copy_only=False)
    n_rows = t.column("n_rows").to_numpy(zero_copy_only=False).astype(np.int64)
    mask = np.isin(cell, env_dirty_cells)
    valid = cell >= 0  # no-geo rows (cell -1) are never dirty
    mask &= valid
    if len(pts_lon):
        # a cell whose bound is +inf (some row has null knn_dist) is
        # beaten by ANY point
        mask |= valid & np.isinf(kd)
        finite = valid & np.isfinite(kd) & ~mask
        # grid-accelerated lower bound: Chebyshev ring distance from
        # each cell to the nearest point-occupied cell, via multi-source
        # dilation over the dense cell grid (cells×points brute force is
        # memory-bandwidth-bound at scale).  mindist(cell, p) >=
        # (cheb - 1) * res, so cells with ((cheb-1)*res)^2 > max_kd
        # can't hold a dirty row; the exact rect test refines survivors.
        ix = (cell >> np.int64(32)).astype(np.int64)
        iy = (cell & np.int64(0xFFFFFFFF)).astype(np.int64)
        nx = int(np.floor(360.0 / res))
        ny = int(np.floor(180.0 / res))
        pix = np.clip(np.floor((pts_lon + 180.0) / res).astype(np.int64), 0, nx - 1)
        piy = np.clip(np.floor((pts_lat + 90.0) / res).astype(np.int64), 0, ny - 1)
        max_kd = float(np.max(kd[finite], initial=0.0)) if finite.any() else 0.0
        max_r = min(64, int(np.ceil(np.sqrt(max_kd) / res)) + 1)
        frontier = np.zeros((nx, ny), dtype=bool)
        frontier[pix, piy] = True
        SENT = np.uint16(max_r + 1)
        cheb = np.where(frontier, np.uint16(0), SENT)
        for r in range(1, max_r + 1):
            # separable 3x3 (Chebyshev) dilation: rows pass, then cols
            b = frontier.copy()
            b[1:, :] |= frontier[:-1, :]
            b[:-1, :] |= frontier[1:, :]
            d = b.copy()
            d[:, 1:] |= b[:, :-1]
            d[:, :-1] |= b[:, 1:]
            newly = d & (cheb == SENT)
            cheb[newly] = np.uint16(r)
            if not newly.any():
                break
            frontier = d
        c_cheb = cheb[ix[finite], iy[finite]].astype(np.float64)
        lower = np.maximum(c_cheb - 1.0, 0.0) * res
        survivors = np.flatnonzero(finite)[(lower * lower) <= kd[finite]]
        if len(survivors) * len(pts_lon) > 8_000_000:
            # refine would cost a cells×points brute force — the delta
            # is dirtying a large fraction of the world anyway, so the
            # bound-level superset is the better trade (the per-row
            # exact test downstream guarantees correctness either way)
            mask[survivors] = True
        elif len(survivors):
            # exact rect-distance refine on the (few) bound survivors
            lo_x = (ix[survivors] * res - 180.0)[:, None]
            lo_y = (iy[survivors] * res - 90.0)[:, None]
            min_d2 = np.full(len(survivors), np.inf)
            for s in range(0, len(pts_lon), 1024):
                px = pts_lon[None, s : s + 1024]
                py = pts_lat[None, s : s + 1024]
                dx = (
                    np.clip(lo_x - px, 0.0, None)
                    + np.clip(px - (lo_x + res), 0.0, None)
                )
                dy = (
                    np.clip(lo_y - py, 0.0, None)
                    + np.clip(py - (lo_y + res), 0.0, None)
                )
                dx *= dx
                dy *= dy
                dx += dy
                np.minimum(min_d2, dx.min(axis=1), out=min_d2)
            # <= mirrors the row-level tie-break (a node at EXACTLY the
            # stored distance can win the id tie-break)
            mask[survivors[min_d2 <= kd[survivors]]] = True
    return cell[mask], tile[mask], int(n_rows[mask].sum())


def _changed_polygon_ids(old_rings: pa.Table, new_rings: pa.Table) -> np.ndarray:
    """Polygon ids whose RING GEOMETRY actually differs between the old
    and recomputed ring sets.  A tag-only (or otherwise non-geometric)
    modify recomputes byte-identical rings — those polygons change no
    PIP result, so they must not dirty their cells (at bench scale this
    is the difference between re-joining a mega-cell and re-joining
    nothing).  Both inputs are delta-sized."""

    def sig(t: pa.Table) -> dict:
        out: dict[int, list] = {}
        for pid, ridx, role, lons, lats in zip(
            t.column("polygon_id").to_pylist(),
            t.column("ring_idx").to_pylist(),
            t.column("role").to_pylist(),
            t.column("lons").to_pylist(),
            t.column("lats").to_pylist(),
        ):
            out.setdefault(pid, []).append((ridx, role, tuple(lons), tuple(lats)))
        return {k: sorted(v) for k, v in out.items()}

    a, b = sig(old_rings), sig(new_rings)
    changed = [
        pid for pid in set(a) | set(b) if a.get(pid) != b.get(pid)
    ]
    return np.asarray(sorted(changed), dtype=np.int64)


def _dirty_assignment_rows(
    store: StateStore,
    moved_or_deleted: np.ndarray,
    new_lon: np.ndarray,
    new_lat: np.ndarray,
    old_lon: np.ndarray,
    old_lat: np.ndarray,
    env_dirty_cells: np.ndarray,
    cfg: EngineConfig,
) -> pa.Table:
    """EXACT set of page-assignment rows that must be recomputed.

    A row needs recomputation iff:
      * its cell is in ``env_dirty_cells`` (an object's old/new extent
        touches it — PIP/geometry dirtiness, strictly local), or
      * its current nearest node was moved/deleted, or
      * some created/moved-in node is CLOSER than its stored knn_dist
        (kNN dirtiness is NON-LOCAL; the state rows carry lon/lat so
        the distance test is exact per page, not a cell bound).

    Two-level scan: the per-cell ``cell_summaries`` bound first prunes
    to candidate cells (see :func:`_candidate_cells` for why that set
    is a superset of every condition above), then the EXACT per-row
    tests run over only the candidate rows.  The summary's per-cell
    row counts give the exact candidate volume up front, choosing the
    execution shape:
      * small (the steady-state minute-diff case): driver threadpool
        read of the candidate tiles + one vectorized pass — no Ray
        pipeline ramp; returns a ``pa.Table``;
      * large: returns the streaming Ray DATASET of dirty rows
        unmaterialized — the caller pipes it through the re-join and
        per-tile COW without the rows ever landing on the driver (when
        candidates cover most tiles a plain directory scan beats a
        per-file pruned read).
    Falls back to the full-table streaming scan on stores without
    summaries.
    """
    from ..schemas import ASSIGNMENTS_STATE

    moved = moved_or_deleted.copy()
    nl = new_lon.copy()
    nt = new_lat.copy()
    env = env_dirty_cells.copy()
    prefilter = None

    def exact_mask(t: pa.Table) -> np.ndarray:
        cell = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(cell, env)
        if len(moved):
            kid = t.column("knn_node_id").to_numpy(zero_copy_only=False)
            mask |= np.isin(kid, moved)
        if len(nl):
            kd = t.column("knn_dist").to_numpy(zero_copy_only=False)
            kd = np.where(np.isnan(kd), np.inf, kd)
            px = t.column("lon").to_numpy(zero_copy_only=False)
            py = t.column("lat").to_numpy(zero_copy_only=False)
            todo = ~mask
            for s in range(0, len(nl), 256):
                idx = np.flatnonzero(todo)
                if not len(idx):
                    break
                dx = px[idx, None] - nl[None, s : s + 256]
                dy = py[idx, None] - nt[None, s : s + 256]
                # <= : a new node at EXACTLY the stored distance can
                # still win the (dist, id) tie-break
                beat = ((dx * dx + dy * dy) <= kd[idx, None]).any(axis=1)
                mask[idx[beat]] = True
                todo[idx[beat]] = False
        return mask

    cols = [f.name for f in ASSIGNMENTS_STATE]
    if store._manifest["tables"].get("cell_summaries"):
        cand_cells, cand_tiles, est_rows = _candidate_cells(
            store,
            np.concatenate([new_lon, old_lon]),
            np.concatenate([new_lat, old_lat]),
            env_dirty_cells,
            cfg,
        )
        if len(cand_cells) == 0:
            return ASSIGNMENTS_STATE.empty_table()
        uniq_tiles = np.unique(cand_tiles)
        if (
            est_rows <= cfg.driver_scan_rows
            and est_rows * max(1, len(nl)) <= cfg.driver_scan_work
        ):
            t = store.read_tiles("assignments", uniq_tiles.tolist())
            keep = np.isin(
                t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64),
                cand_cells,
            )
            t = t.filter(pa.array(keep))
            out = t.filter(pa.array(exact_mask(t)))
            return out.select(cols).cast(ASSIGNMENTS_STATE)
        existing = store.tile_ids("assignments")
        if len(uniq_tiles) * 2 >= len(existing):
            ds = store.read_tiles_dataset("assignments")
        else:
            ds = store.read_tiles_dataset(
                "assignments", tile_ids=uniq_tiles.tolist()
            )
        prefilter = cand_cells
    else:
        ds = store.read_tiles_dataset("assignments")

    def dirty_rows(t: pa.Table) -> pa.Table:
        if prefilter is not None:
            cell = (
                t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            t = t.filter(pa.array(np.isin(cell, prefilter)))
        return t.filter(pa.array(exact_mask(t))).select(cols).cast(
            ASSIGNMENTS_STATE
        )

    return ds.map_batches(dirty_rows, batch_format="pyarrow")


def _write_op_stream(out_dir: str, ops: list[tuple[str, str, pa.Table]]) -> list[dict]:
    """File-sink audit mode (reference §3.3: ``-o out.sparql`` writes the
    UPDATE operations to a file instead of POSTing,
    src/sparql/SparqlWrapper.cpp:88-146 short-circuiting perform() at
    :134).  Each op lands as Parquet; ``ops.jsonl`` is the ordered
    manifest of the would-be mutation (one line per table+op)."""
    import json
    import os

    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    lines = []
    for table, op, payload in ops:
        fname = f"{table}.{op}.parquet"
        _pq.write_table(payload, os.path.join(out_dir, fname))
        lines.append({"table": table, "op": op, "rows": payload.num_rows,
                      "file": fname})
    with open(os.path.join(out_dir, "ops.jsonl"), "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    return lines


def _ids_table(ids: np.ndarray, name: str = "id") -> pa.Table:
    return pa.Table.from_pydict(
        {name: pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64())}
    )


def apply_changes(
    store: StateStore,
    changes: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    enforce_watermark: bool = False,
    source: str | None = None,
    emit_ops_dir: str | None = None,
) -> dict:
    """Apply one change window; returns the run's counter/summary dict
    (the reference's StatisticsHandler analog, ST5).

    ``emit_ops_dir``: audit/file-sink mode — compute the whole delta
    (classification, reconstruction, geometry, invalidation) against the
    CURRENT store, write the would-be delete/insert op stream there, and
    return WITHOUT mutating any state (reference §3.3 ``-o``: reads
    still hit the endpoint, writes go to the file).  The derived tile
    rewrite is represented by the invalidated assignment rows
    (``assignments.invalidate``) — their re-join output depends on the
    post-mutation layers, which an uncommitted run never has."""
    # ST2: the store's persisted option set wins over the caller's
    # config — which derived columns exist was decided at bootstrap
    cfg = store.discovered_config(cfg)
    if enforce_watermark and store.watermark:
        # resume semantics (reference decideStartSequenceNumber,
        # OsmUpdater.cpp:169-236): the stored sequence number is only
        # comparable when this window comes from the SAME replication
        # source; otherwise fall back to the timestamp — exactly the
        # tree in pipelines/watermark.py, applied per-row because a raw
        # window has no states list to map ts -> seq against.
        wm = store.watermark
        if source is not None and source == wm.get("source"):
            keep = pc.greater(changes.column("seq"), wm["seq"])
        else:
            from datetime import datetime

            wm_ts = datetime.strptime(wm["ts"], "%Y-%m-%dT%H:%M:%S")
            # >= : the watermark second is RE-APPLIED (the reference's
            # deliberate overlap-by-one, state_for_timestamp — the
            # idempotent delete+insert absorbs replayed rows), because a
            # strict > would permanently drop genuinely NEW edits that
            # share the boundary second with the watermark
            keep = pc.greater_equal(
                changes.column("ts"),
                pa.scalar(wm_ts, type=changes.schema.field("ts").type),
            )
        changes = changes.filter(keep)

    import time as _time

    timers: dict[str, float] = {}
    _t0 = _time.time()
    ch = dedup_table(changes)
    timers["dedup"] = _time.time() - _t0
    _t0 = _time.time()
    plan = classify(ch, store)
    timers["classify_cascade"] = _time.time() - _t0
    summary: dict = {
        "input_rows": changes.num_rows,
        "deduped_rows": ch.num_rows,
        **{
            k: int(len(getattr(plan, k)))
            for k in (
                "created_nodes", "modified_nodes", "modified_nodes_loc_changed",
                "deleted_nodes", "created_ways", "modified_ways", "deleted_ways",
                "created_relations", "modified_relations", "deleted_relations",
                "ways_to_update_geometry", "relations_to_update_geometry",
                "referenced_nodes", "referenced_ways", "referenced_relations",
            )
        },
    }
    if plan.is_empty():
        # reference early exit (OsmChangeHandler.cpp:94-97)
        summary.update(dirty_cells=0, tiles_rewritten=0, empty=True)
        return summary

    _t0 = _time.time()
    rec = reconstruct(plan, store)
    timers["reconstruct"] = _time.time() - _t0

    # --- old payload snapshots (pre-mutation), for edge deletion and
    # old-extent dirtiness
    all_ways = plan.all_ways()
    all_rels = plan.all_relations()
    old_ways = store.lookup("ways", all_ways)
    old_rels = store.lookup("relations", all_rels)
    # polygon ids whose rings may change (ways + offset relations)
    affected_poly_ids = np.unique(
        np.concatenate(
            [
                all_ways,
                plan.ways_to_update_geometry,
                (all_rels + REL_POLY_OFFSET),
                (plan.relations_to_update_geometry + REL_POLY_OFFSET),
            ]
        )
    )
    # old rings BEFORE mutation: their bbox cells are where PIP results
    # can change for removed/moved geometry
    old_rings = store.lookup("polygon_rings", affected_poly_ids)

    # --- delta payloads
    node_upserts = _payload(ch, "node", OSM_NODES)
    way_upserts = _payload(ch, "way", OSM_WAYS)
    rel_upserts = _payload(ch, "relation", OSM_RELATIONS)

    # --- geometry recompute universe (the osm2rdf input file analog:
    # change file + dummies, OsmChangeHandler.cpp:372-385)
    coord_nodes = _merge_prefer_last(
        rec["nodes"].select(["id", "lon", "lat"]),
        node_upserts.select(["id", "lon", "lat"]),
    )
    lookup = geometry.NodeCoordLookup.from_table(coord_nodes)
    dirty_way_rows = rec["ways"].filter(
        pc.is_in(
            rec["ways"].column("id"),
            value_set=pa.array(plan.ways_to_update_geometry),
        )
    )
    ways_recompute = _merge_prefer_last(dirty_way_rows, way_upserts)
    dirty_rel_rows = rec["relations"].filter(
        pc.is_in(
            rec["relations"].column("id"),
            value_set=pa.array(plan.relations_to_update_geometry),
        )
    )
    rels_recompute = _merge_prefer_last(dirty_rel_rows, rel_upserts)
    way_universe = _merge_prefer_last(rec["ways"], way_upserts)

    _t0 = _time.time()
    new_geom_parts = [
        geometry.node_geoms(node_upserts, cfg),
        geometry.way_geoms(ways_recompute, lookup, cfg),
        geometry.relation_geoms(rels_recompute, way_universe, lookup, cfg),
    ]
    nonempty = [p for p in new_geom_parts if p.num_rows]
    from ..schemas import GEOMS

    new_geoms = pa.concat_tables(nonempty) if nonempty else GEOMS.empty_table()
    # delete-only windows legitimately recompute nothing
    new_geoms = new_geoms.append_column(
        "gid",
        pa.array(
            pack_gid(
                new_geoms.column("type").to_pylist(),
                new_geoms.column("id").to_numpy(zero_copy_only=False),
            ),
            type=pa.int64(),
        ),
    )

    new_rings = geometry.polygon_rings_from_osm(
        ways_recompute, rels_recompute, lookup, way_nodes_source=way_universe
    )
    timers["geometry_recompute"] = _time.time() - _t0
    # --- dirty cells: old extent ∪ new extent (node→way→relation→cell)
    # plus the non-local kNN invalidation set
    _t0 = _time.time()
    moved_or_deleted = np.unique(
        np.concatenate([plan.deleted_nodes, plan.modified_nodes_loc_changed])
    )
    knn_source_ids = np.unique(
        np.concatenate([plan.created_nodes, plan.modified_nodes_loc_changed])
    )
    knn_new = node_upserts.filter(
        pc.is_in(node_upserts.column("id"), value_set=pa.array(knn_source_ids))
    )
    changed_pids = _changed_polygon_ids(old_rings, new_rings)
    old_changed = old_rings.filter(
        pc.is_in(old_rings.column("polygon_id"), value_set=pa.array(changed_pids))
    )
    new_changed = new_rings.filter(
        pc.is_in(new_rings.column("polygon_id"), value_set=pa.array(changed_pids))
    )
    env_dirty_cells = np.unique(
        np.concatenate(
            [
                _ring_cells(old_changed, cfg.cell_res_deg),
                _ring_cells(new_changed, cfg.cell_res_deg),
            ]
        )
    )
    # OLD locations of moved/deleted nodes (pre-mutation): bound the
    # cells that can hold rows whose stored nearest node is affected
    old_locs = store.node_locations(moved_or_deleted)
    dirty_rows = _dirty_assignment_rows(
        store,
        moved_or_deleted,
        knn_new.column("lon").to_numpy(zero_copy_only=False),
        knn_new.column("lat").to_numpy(zero_copy_only=False),
        old_locs.column("lon").to_numpy(zero_copy_only=False),
        old_locs.column("lat").to_numpy(zero_copy_only=False),
        env_dirty_cells,
        cfg,
    )
    # a Dataset return = the big-invalidation STREAMING path: the dirty
    # rows never land on the driver; counts come from the staged COW
    streaming = not isinstance(dirty_rows, pa.Table)
    if streaming and emit_ops_dir is not None:
        # audit mode: the dirty rows ARE the op payload, so the file
        # sink necessarily materializes them (reference §3.3 writes the
        # full op stream to disk; this mode is for inspection, not scale)
        from ..schemas import ASSIGNMENTS_STATE

        batches = [
            b
            for b in dirty_rows.iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        dirty_rows = (
            pa.concat_tables(batches).cast(ASSIGNMENTS_STATE)
            if batches
            else ASSIGNMENTS_STATE.empty_table()
        )
        streaming = False
    if streaming:
        # run the distributed scan ONCE into the object store (blocks,
        # not driver heap), then pick the re-join shape from the EXACT
        # dirty-row count: a delta-sized dirty set re-joins on the
        # driver thread pool (a Ray pipeline's ~2s ramp + per-tile
        # staging parquet loses badly below ~500k rows — measured
        # 9.6 s vs 17 s on the adversarial 10k-change window), while a
        # corpus-sized one stays fully streaming and never lands on
        # the driver
        from ..schemas import ASSIGNMENTS_STATE

        dirty_rows = dirty_rows.materialize()
        if dirty_rows.count() <= cfg.rejoin_driver_rows:
            batches = [
                b
                for b in dirty_rows.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                if b.num_rows
            ]
            dirty_rows = (
                pa.concat_tables(batches).cast(ASSIGNMENTS_STATE)
                if batches
                else ASSIGNMENTS_STATE.empty_table()
            )
            streaming = False
    if not streaming:
        summary["dirty_cells"] = int(
            len(np.unique(
                dirty_rows.column("cell_id").to_numpy(zero_copy_only=False)
            ))
        )
        summary["rejoined_pages"] = int(dirty_rows.num_rows)
    timers["invalidation_scan"] = _time.time() - _t0

    if emit_ops_dir is not None:
        ops = _write_op_stream(
            emit_ops_dir,
            [
                ("nodes", "upsert", node_upserts),
                ("nodes", "delete", _ids_table(plan.deleted_nodes)),
                ("ways", "upsert", way_upserts),
                ("ways", "delete", _ids_table(plan.deleted_ways)),
                ("relations", "upsert", rel_upserts),
                ("relations", "delete", _ids_table(plan.deleted_relations)),
                ("geoms", "upsert", new_geoms),
                (
                    "geoms",
                    "delete",
                    _ids_table(
                        np.concatenate(
                            [
                                pack_gid("node", plan.deleted_nodes),
                                pack_gid("way", plan.deleted_ways),
                                pack_gid("relation", plan.deleted_relations),
                            ]
                        ),
                        "gid",
                    ),
                ),
                ("polygon_rings", "upsert", new_rings),
                ("polygon_rings", "delete",
                 _ids_table(affected_poly_ids, "polygon_id")),
                # edge tables: delete every edge OWNED by a touched
                # way/relation, insert the re-exploded member lists
                # (same semantics as apply_owned_edges below)
                ("way_members_by_node", "delete_owners",
                 _ids_table(all_ways, "way_id")),
                ("way_members_by_node", "upsert",
                 explode_way_members(way_upserts)),
                ("rel_members_by_member", "delete_owners",
                 _ids_table(all_rels, "rel_id")),
                ("rel_members_by_member", "upsert",
                 explode_rel_members(rel_upserts)),
                ("assignments", "invalidate", dirty_rows),
            ],
        )
        summary.update(
            emitted_ops=len(ops), ops_dir=emit_ops_dir,
            tiles_rewritten=0, empty=False, timers=timers,
        )
        return summary

    # --- apply state mutations (COW partitions; commit at the end)
    _t0 = _time.time()
    store.begin()
    store.apply_upserts_deletes("nodes", node_upserts, plan.deleted_nodes)
    store.apply_upserts_deletes("ways", way_upserts, plan.deleted_ways)
    store.apply_upserts_deletes("relations", rel_upserts, plan.deleted_relations)

    old_way_edges = explode_way_members(old_ways)
    store.apply_owned_edges(
        "way_members_by_node",
        explode_way_members(way_upserts),
        owner_col="way_id",
        owner_ids=all_ways,
        touch_keys=old_way_edges.column("node_id").to_numpy(zero_copy_only=False),
    )
    old_rel_edges = explode_rel_members(old_rels)
    store.apply_owned_edges(
        "rel_members_by_member",
        explode_rel_members(rel_upserts),
        owner_col="rel_id",
        owner_ids=all_rels,
        touch_keys=old_rel_edges.column("member_id").to_numpy(zero_copy_only=False),
    )

    deleted_gids = np.concatenate(
        [
            pack_gid("node", plan.deleted_nodes),
            pack_gid("way", plan.deleted_ways),
            pack_gid("relation", plan.deleted_relations),
        ]
    )
    store.apply_upserts_deletes("geoms", new_geoms, deleted_gids)

    # polygon layer delta: every affected polygon id is dropped and
    # re-derived from the recomputed objects
    store.apply_upserts_deletes("polygon_rings", new_rings, affected_poly_ids)

    timers["state_mutation"] = _time.time() - _t0
    # O(delta) maintenance of the cross-window live join-layer indexes
    # (no-op when no cache exists yet; the re-join below builds it once)
    _t0 = _time.time()
    store.update_layer_indexes(
        affected_poly_ids, new_rings, plan.deleted_nodes, node_upserts
    )
    timers["index_update"] = _time.time() - _t0
    # --- re-join EXACTLY the dirty rows against the NEW layers, then
    # per-url COW merge into the affected tiles
    _t0 = _time.time()
    tiles_rewritten = 0
    if streaming:
        # fully-streaming path: dirty Dataset -> spatial-join stages ->
        # staged per-tile parquet -> one COW task per tile.  The
        # re-joined rows NEVER land on the driver (the at-scale shape:
        # an adversarial window can invalidate a corpus-sized fraction)
        import ray

        node_files = store._files("nodes")
        n_nodes = sum(store.io.read_metadata(f).num_rows
                      for f in node_files)
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        rejoin_in = dirty_rows.map_batches(
            lambda t: t.select(["url", "lon", "lat", "cell_id", "tile_id"]),
            batch_format="pyarrow",
        )
        if n_nodes > cfg.broadcast_node_rows:
            # layers too big to broadcast: file-group shards for BOTH
            # sides (nodes by cell range, rings by the store's
            # polygon_id hash partitions), each read and indexed by its
            # OWN actor — no process (driver included) ever holds a
            # full layer
            k = min(8, len(node_files)) or 1
            groups = [list(g) for g in np.array_split(node_files, k)]
            ring_files = store._files("polygon_rings")
            kr = min(4, len(ring_files)) or 1
            ring_groups = [
                list(g) for g in np.array_split(ring_files, kr) if len(g)
            ]
            ds = spatial.spatial_join_sharded(
                rejoin_in, ring_groups, groups, cfg,
                keep_lonlat=True, concurrency=(1, max(2, n_cpu // k)),
                filesystem=store.io.fs,
            )
        else:
            _ti = _time.time()
            poly_ref, node_ref, built = store.layer_index_refs(
                cfg, pending=True
            )
            timers["index_build" if built else "index_reuse"] = (
                _time.time() - _ti
            )
            ds = spatial.spatial_join(
                rejoin_in, None, None, cfg,
                keep_lonlat=True, concurrency=(2, max(4, n_cpu - 2)),
                layer_refs=(poly_ref, node_ref),
            )
        summary_rows, old_cells, stats = store.cow_merge_tiles_streaming(
            ds, tiles.tile_rollup_table, tiles.cell_summary_table
        )
        if store._manifest["tables"].get("cell_summaries"):
            store.apply_upserts_deletes("cell_summaries", summary_rows, old_cells)
        tiles_rewritten = stats["tiles"]
        summary["dirty_cells"] = stats["staged_cells"]
        summary["rejoined_pages"] = stats["staged_rows"]
        timers["rejoin"] = stats.get("staging_sec", 0.0)
    elif dirty_rows.num_rows:
        node_files = store._files("nodes")
        n_nodes = sum(store.io.read_metadata(f).num_rows
                      for f in node_files)
        rejoin_input = dirty_rows.select(
            ["url", "lon", "lat", "cell_id", "tile_id"]
        )
        if dirty_rows.num_rows > cfg.rejoin_driver_rows:
            # distributed re-join (big invalidation => Ray pipeline);
            # from_arrow yields ONE block — split it or a single actor
            # would process every batch serially
            import ray
            import ray.data as rd

            n_cpu = int(ray.cluster_resources().get("CPU", 8))
            pages_in = rd.from_arrow(rejoin_input).repartition(max(16, n_cpu * 2))
            if n_nodes > cfg.broadcast_node_rows:
                # layers too big to broadcast: file-group shards for
                # BOTH sides (nodes by cell range, rings by the store's
                # polygon_id hash partitions), each read and indexed by
                # its OWN actor — no process (driver included) ever
                # holds a full layer
                k = min(8, len(node_files)) or 1
                groups = [list(g) for g in np.array_split(node_files, k)]
                ring_files = store._files("polygon_rings")
                kr = min(4, len(ring_files)) or 1
                ring_groups = [
                    list(g) for g in np.array_split(ring_files, kr) if len(g)
                ]
                ds = spatial.spatial_join_sharded(
                    pages_in, ring_groups, groups, cfg,
                    keep_lonlat=True, concurrency=(1, max(2, n_cpu // k)),
                    filesystem=store.io.fs,
                )
            else:
                _ti = _time.time()
                poly_ref, node_ref, built = store.layer_index_refs(
                    cfg, pending=True
                )
                timers["index_build" if built else "index_reuse"] = (
                    _time.time() - _ti
                )
                ds = spatial.spatial_join(
                    pages_in, None, None, cfg,
                    keep_lonlat=True, concurrency=(2, max(4, n_cpu - 2)),
                    layer_refs=(poly_ref, node_ref),
                )
            recomputed = pa.concat_tables(
                list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
            )
        else:
            # driver path: a Ray pipeline costs ~2s of ramp, which
            # LOSES to one thread below ~600k rows — fan the join out
            # on a thread pool (the kernel is numpy, which releases the
            # GIL) over the store's LIVE indexes (cached across
            # windows, maintained O(delta) by update_layer_indexes —
            # the full build only happens once per process or after a
            # compaction signal)
            from concurrent.futures import ThreadPoolExecutor

            _ti = _time.time()
            poly_idx, node_idx, built = store.layer_indexes(cfg, pending=True)
            timers["index_build" if built else "index_reuse"] = (
                _time.time() - _ti
            )
            joiner = spatial.SpatialJoiner(
                poly_idx, node_idx, cfg, keep_lonlat=True
            )
            nthreads = max(
                1, min(cfg.rejoin_driver_threads,
                       rejoin_input.num_rows // 16384 + 1)
            )
            if nthreads == 1:
                recomputed = joiner(rejoin_input)
            else:
                step = -(-rejoin_input.num_rows // nthreads)
                chunks = [
                    rejoin_input.slice(i, step)
                    for i in range(0, rejoin_input.num_rows, step)
                ]
                with ThreadPoolExecutor(nthreads) as ex:
                    recomputed = pa.concat_tables(list(ex.map(joiner, chunks)))
        recomputed = recomputed.cast(dirty_rows.schema)
        timers["rejoin"] = _time.time() - _t0
        touch_tiles = np.unique(
            np.concatenate(
                [
                    recomputed.column("tile_id").to_numpy(zero_copy_only=False),
                    dirty_rows.column("tile_id").to_numpy(zero_copy_only=False),
                ]
            )
        ).tolist()
        existing = set(store.tile_ids("assignments"))
        touch_tiles = [int(t) for t in touch_tiles if int(t) in existing]
        if len(touch_tiles) >= cfg.cow_task_tiles:
            # distributed COW: per-tile merge + rollup run as Ray tasks
            # (S7 at scale — no whole-tile merge on the driver)
            summary_rows, old_cells = store.cow_merge_tiles_distributed(
                touch_tiles, recomputed,
                dirty_rows.column("url").combine_chunks(),
                tiles.tile_rollup_table, tiles.cell_summary_table,
            )
            if store._manifest["tables"].get("cell_summaries"):
                store.apply_upserts_deletes(
                    "cell_summaries", summary_rows, old_cells
                )
        else:
            old_assign = store.read_tiles("assignments", touch_tiles)
            keep_old = pc.invert(
                pc.is_in(
                    old_assign.column("url"),
                    value_set=dirty_rows.column("url").combine_chunks(),
                )
            )
            merged = pa.concat_tables(
                [old_assign.filter(keep_old).cast(recomputed.schema), recomputed]
            )
            store.replace_tiles("assignments", touch_tiles, merged)
            if merged.num_rows:
                store.replace_tiles(
                    "rollups", touch_tiles, tiles.tile_rollup_table(merged)
                )
            else:
                store.replace_tiles(
                    "rollups", touch_tiles, tiles.TILE_ROLLUP.empty_table()
                )
            if store._manifest["tables"].get("cell_summaries"):
                # maintain the per-cell prune index: rows of the touched
                # tiles' old cells replaced by the recomputed summary (a
                # cell nests in exactly one tile, so the old-cell set
                # fully covers what the rewrite can change)
                old_cells = np.unique(
                    old_assign.column("cell_id").to_numpy(zero_copy_only=False)
                )
                store.apply_upserts_deletes(
                    "cell_summaries", tiles.cell_summary_table(merged), old_cells
                )
        tiles_rewritten = len(touch_tiles)
    timers["rejoin_and_cow"] = _time.time() - _t0
    summary["tiles_rewritten"] = tiles_rewritten

    # --- watermark + atomic commit (updatesCompleteUntil analog)
    seqs = changes.column("seq")
    if changes.num_rows:
        # canonical ISO "YYYY-MM-DDTHH:MM:SS": the watermark is compared
        # lexicographically (reference OsmReplicationServerHelper.cpp:112-121)
        store.set_watermark(
            int(pc.max(seqs).as_py()),
            pc.max(changes.column("ts")).as_py().strftime("%Y-%m-%dT%H:%M:%S"),
            source=source,
        )
    if os.environ.get("OLU_CRASH_BEFORE_COMMIT"):
        # test-only fault injection: simulate a driver killed at the
        # worst moment — every partition/tile file written, manifest
        # NOT swapped.  Resume correctness depends on exactly this gap.
        os._exit(137)
    _t0 = _time.time()
    store.commit()
    timers["commit"] = _time.time() - _t0
    summary["empty"] = False
    summary["timers"] = {k: round(v, 3) for k, v in timers.items()}
    return summary
