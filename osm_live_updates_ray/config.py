"""Engine configuration.

Mirrors the reference's CLI/config surface (reference:
src/config/Config.cpp:34-420, include/config/Config.h) re-expressed for
a Ray Data engine: batch sizes, grid resolutions, shuffle knobs, state
paths.  The reference's ``--batch-size`` (default 1<<18, Config.h:38)
chunked every endpoint interaction; here it sizes broadcast id-set
lookups and map_batches batches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class EngineConfig:
    # --- grid / tiling -------------------------------------------------
    #: cell resolution in degrees (H3/S2-style uint64 grid cells; one
    #: cell is the unit of spatial-join partitioning and of delta
    #: dirtiness).
    cell_res_deg: float = 1.0
    #: tile resolution in degrees (rollup unit; one tile = many cells).
    tile_res_deg: float = 10.0

    # --- batching ------------------------------------------------------
    #: ids per broadcast lookup chunk (reference default 1<<18,
    #: include/config/Config.h:38).
    batch_size: int = 1 << 18
    #: rows per map_batches batch in hot vectorized stages.  Swept on
    #: the 32-CPU headline (interleaved, load-gated): 32768 beat 8192
    #: in every pair (median +20% at 32 CPUs, +2% at 8 — larger batches
    #: amortize per-batch gather/dispatch overhead precisely where more
    #: actors contend); 65536 measured no further gain.  Page rows are
    #: ~1 KB so a batch is ~32 MB — well inside worker heaps.
    map_batch_size: int = 32768
    #: actor pool size for stateful spatial stages; None = tasks.
    spatial_concurrency: Optional[int] = None

    #: invalidation-scan shape switch: candidate sets at or below this
    #: many rows (AND below driver_scan_work pairwise ops) run as one
    #: driver threadpool read + vectorized pass — a Ray pipeline has
    #: ~2s fixed ramp, so small scans are pure overhead there.
    driver_scan_rows: int = 2_000_000
    #: rows x delta-points product cap for the driver path (the exact
    #: distance test is the driver's only O(rows*points) cost).
    driver_scan_work: int = 200_000_000
    #: node layers above this many rows are never broadcast: the delta
    #: re-join switches to cell-range-sharded kNN index actors, each
    #: reading its own partition files.
    broadcast_node_rows: int = 5_000_000
    #: dirty-row counts above this re-join as a distributed Ray
    #: pipeline; at or below, a THREADED driver-side joiner (no Ray
    #: ramp — measured breakeven vs the ~2s pipeline ramp is ~600k
    #: rows with 8 threads on this kernel).
    rejoin_driver_rows: int = 500_000
    #: thread-pool width for the driver-side re-join (numpy kernel
    #: releases the GIL; chunks are independent).
    rejoin_driver_threads: int = 4
    #: touched-tile counts at or above this rewrite COW tiles as Ray
    #: tasks (merge + rollup per tile off-driver); below, the driver
    #: threadpool path (cheaper for a handful of tiles).
    cow_task_tiles: int = 64

    # --- driver-reduce gates -------------------------------------------
    # One policy, five knobs: a stage whose EXACT intermediate
    # cardinality (measured with .count() / parquet metadata, never
    # guessed) is at or below its gate runs the cheap driver-side /
    # broadcast shape — the data is small BY CONSTRUCTION, and a Ray
    # all-to-all has ~2s fixed ramp that dwarfs it.  Above the gate the
    # stage switches to the distributed shape (hash join / groupby /
    # label propagation) and nothing key- or corpus-sized ever lands on
    # one process.  Every gate has BOTH branches equality-tested by
    # forcing the gate to 0 in a pytest.
    #: small-side key sets (dim keys, dup-id sets, order-key maps) at
    #: or below this are ray.put-broadcast for sorted-probe / isin
    #: lookups; above, a hash semi/anti-join.
    broadcast_keys_max: int = 2_000_000
    #: near-dup graphs with at most this many EXACT edges run driver
    #: union-find; above, distributed min-label propagation.
    cc_edge_gate: int = 2_000_000
    #: mergeable partial rows (shingle df counts, k-means cluster sums)
    #: at or below this are driver-reduced; above, a Ray groupby-sum.
    driver_partials_max: int = 5_000_000
    #: exact-dedup duplicate-id sets above this switch the final filter
    #: to a hash anti-join (stages/dedup_docs.py).
    broadcast_id_limit: int = 5_000_000
    #: near-dup candidate-verify corpora at or below this many docs use
    #: the broadcast bitmap verifier; above, a sig-prefiltered hash
    #: join (stages/dedup_docs.py).
    broadcast_docs_max: int = 200_000
    #: the PPJoin prefix-order df dict broadcast keeps only the top
    #: this-many shingles by df — bounds per-worker memory at O(cap)
    #: instead of O(corpus vocabulary).  Shingles outside the cap
    #: default to df=1; the order stays a pure total function of the
    #: shingle, so the join stays EXACT at any cap (pytest forces
    #: cap=7 and asserts pair-set equality).
    ppjoin_hot_df_cap: int = 5_000_000

    # --- skew handling -------------------------------------------------
    #: cells whose page count exceeds this are salted into
    #: ``salt_factor`` sub-partitions for the shuffle-based join path.
    mega_cell_threshold: int = 200_000
    salt_factor: int = 16

    # --- geometry ------------------------------------------------------
    #: WKT coordinate precision (reference: Config.h:36
    #: DEFAULT_WKT_PRECISION = 7, std::fixed).
    wkt_precision: int = 7

    # --- state store ---------------------------------------------------
    state_dir: str = "/tmp/olu_ray_state"
    #: number of hash partitions for id-keyed state tables.
    id_partitions: int = 16
    #: number of hash partitions for cell-keyed tables (pages, tiles).
    cell_partitions: int = 16

    # --- derived-column options (reference ST2: osm2rdf options
    # discovered from the endpoint decide which derived columns exist;
    # here they are explicit config, consulted by delete/recompute).
    with_centroid: bool = True
    with_envelope: bool = True
    with_convex_hull: bool = True
    with_obb: bool = False
    with_length: bool = True
    with_area: bool = True

    # --- cascade -------------------------------------------------------
    #: follow the relation→relation reverse hop in the dirty cascade
    #: (J7).  Default False = reference parity: the reference's own
    #: rel-of-rel query exists but is never invoked from run()
    #: (OsmChangeHandler.cpp:289-304 has no caller); enabling this
    #: dirties relations whose members are dirty/changed RELATIONS too
    #: (one hop, no transitive closure — matching the dead code's
    #: shape).
    rel_of_rel_hop: bool = False


DEFAULT_CONFIG = EngineConfig()
