"""Delta semantics: classification, dirty-geometry cascade, reference
closure, reconstruction — the heart of the reference's incremental
update (reference: src/osm/OsmChangeHandler.cpp:60-178 run()).

The deduped change window is set algebra over id sets (the reference
holds every set in driver memory, include/osm/NodeHandler.h:99-109
etc.); state interactions are partition-pruned semi-join lookups
against the Parquet state store — the analog of the reference's
batched VALUES queries.  This scales because the delta is tiny
relative to state (a planet minute-diff is ~1 MB): the BIG side is
only ever touched through key-pruned scans, never materialized.

Every rule below cites the reference line it mirrors; the tricky
exclusions ("not in change file") and the modify-of-absent
reclassification are encoded as named, unit-tested expressions.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import DIRTY_SETS
from ..state.store import StateStore


def _np(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False)


@dataclasses.dataclass
class DeltaPlan:
    """All id buckets of one change window (reference's handler sets)."""

    # per-type classification (reference: NodeHandler/WayHandler/
    # RelationHandler::node/way/relation)
    created_nodes: np.ndarray
    modified_nodes: np.ndarray  # location unchanged
    modified_nodes_loc_changed: np.ndarray
    deleted_nodes: np.ndarray
    created_ways: np.ndarray
    modified_ways: np.ndarray
    deleted_ways: np.ndarray
    created_relations: np.ndarray
    modified_relations: np.ndarray
    modified_areas: np.ndarray  # subset with type in {multipolygon, boundary}
    deleted_relations: np.ndarray
    # dirty-geometry cascade (reference: OsmChangeHandler.cpp:215-285)
    ways_to_update_geometry: np.ndarray
    relations_to_update_geometry: np.ndarray
    # reference closure (reference: ReferencesHandler.cpp:27-99)
    referenced_nodes: np.ndarray
    referenced_ways: np.ndarray
    referenced_relations: np.ndarray

    def all_nodes(self) -> np.ndarray:
        """created ∪ modified ∪ modified_loc_changed ∪ deleted
        (reference: NodeHandler.h:53-61 getAllNodes)."""
        return np.unique(
            np.concatenate(
                [
                    self.created_nodes,
                    self.modified_nodes,
                    self.modified_nodes_loc_changed,
                    self.deleted_nodes,
                ]
            )
        )

    def all_ways(self) -> np.ndarray:
        return np.unique(
            np.concatenate([self.created_ways, self.modified_ways, self.deleted_ways])
        )

    def all_relations(self) -> np.ndarray:
        return np.unique(
            np.concatenate(
                [self.created_relations, self.modified_relations, self.deleted_relations]
            )
        )

    def is_empty(self) -> bool:
        """Early-exit condition (reference: OsmChangeHandler.cpp:94-97)."""
        return (
            len(self.all_nodes()) == 0
            and len(self.all_ways()) == 0
            and len(self.all_relations()) == 0
        )

    def dirty_sets_table(self) -> pa.Table:
        """The introspection table golden-compared in tests
        (FIXTURES.md §4)."""
        rows: list[tuple[str, np.ndarray, str]] = [
            ("node", self.created_nodes, "created"),
            ("node", self.modified_nodes, "modified"),
            ("node", self.modified_nodes_loc_changed, "modified_loc_changed"),
            ("node", self.deleted_nodes, "deleted"),
            ("way", self.created_ways, "created"),
            ("way", self.modified_ways, "modified"),
            ("way", self.deleted_ways, "deleted"),
            ("relation", self.created_relations, "created"),
            ("relation", self.modified_relations, "modified"),
            ("relation", self.deleted_relations, "deleted"),
            ("way", self.ways_to_update_geometry, "ways_to_update_geometry"),
            (
                "relation",
                self.relations_to_update_geometry,
                "relations_to_update_geometry",
            ),
            ("node", self.referenced_nodes, "referenced_nodes"),
            ("way", self.referenced_ways, "referenced_ways"),
            ("relation", self.referenced_relations, "referenced_relations"),
        ]
        types, ids, buckets = [], [], []
        for t, arr, b in rows:
            types.extend([t] * len(arr))
            ids.extend(arr.tolist())
            buckets.extend([b] * len(arr))
        return pa.Table.from_pydict(
            {"type": types, "id": ids, "bucket": buckets}, schema=DIRTY_SETS
        )


def _setdiff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.setdiff1d(a, b, assume_unique=False)


def classify(changes: pa.Table, store: StateStore) -> DeltaPlan:
    """Classify a DEDUPED change window and run the dirty cascade +
    closure.  ``changes`` must already be last-version-deduped (O1).

    Steps (mirroring OsmChangeHandler::run, OsmChangeHandler.cpp:60-178):
      1. per-type routing by action (handlers M1/M2)
      2. node-location check J1 splits MODIFY nodes into
         {unchanged, loc_changed, actually-new} (NodeHandler.cpp:48-80)
      3. cascade J2/J3 (getIdsOfWaysToUpdateGeo / RelationsToUpdateGeo)
      4. closure over change-file members + J4/J5
    """
    empty = np.empty(0, dtype=np.int64)

    def bucket(otype: str, action: str) -> np.ndarray:
        mask = pc.and_(
            pc.equal(changes.column("type"), otype),
            pc.equal(changes.column("action"), action),
        )
        return np.unique(_np(changes.filter(mask).column("id")))

    created_nodes = bucket("node", "create")
    deleted_nodes = bucket("node", "delete")
    created_ways = bucket("way", "create")
    modified_ways = bucket("way", "modify")
    deleted_ways = bucket("way", "delete")
    created_relations = bucket("relation", "create")
    modified_relations = bucket("relation", "modify")
    deleted_relations = bucket("relation", "delete")

    # modified areas: relations with tags["type"] in {multipolygon,
    # boundary} (reference: RelationHandler.cpp:43-47)
    rel_mod = changes.filter(
        pc.and_(
            pc.equal(changes.column("type"), "relation"),
            pc.equal(changes.column("action"), "modify"),
        )
    )
    if rel_mod.num_rows:
        # vectorized map lookup: tags["type"] ∈ {multipolygon, boundary}
        tval = pc.map_lookup(
            rel_mod.column("tags").combine_chunks(),
            query_key="type", occurrence="first",
        )
        is_area = pc.fill_null(
            pc.is_in(tval, value_set=pa.array(["multipolygon", "boundary"])),
            False,
        )
        modified_areas = np.unique(_np(rel_mod.filter(is_area).column("id")))
    else:
        modified_areas = empty

    # --- J1: node-location check (NodeHandler::checkNodesForLocationChange)
    node_mod = changes.filter(
        pc.and_(
            pc.equal(changes.column("type"), "node"),
            pc.equal(changes.column("action"), "modify"),
        )
    )
    mod_ids = _np(node_mod.column("id"))
    mod_lon = _np(node_mod.column("lon"))
    mod_lat = _np(node_mod.column("lat"))
    state_nodes = store.node_locations(mod_ids)
    s_ids = _np(state_nodes.column("id"))
    s_lon = _np(state_nodes.column("lon"))
    s_lat = _np(state_nodes.column("lat"))
    # vectorized J1 split via searchsorted over the (unique) state ids:
    # absent => CREATE (NodeHandler.cpp:70-76; rationale
    # OsmObjectHelper.h:106-117); present-and-same-coords => unchanged
    # MODIFY; else location-changed (NaN coords compare unequal, same
    # as the reference's string compare of distinct WKT literals)
    if len(s_ids):
        order = np.argsort(s_ids)
        s_ids_s = s_ids[order]
        s_lon_s = s_lon[order]
        s_lat_s = s_lat[order]
        pos = np.searchsorted(s_ids_s, mod_ids)
        posc = np.clip(pos, 0, len(s_ids_s) - 1)
        found = s_ids_s[posc] == mod_ids
        same = found & (mod_lon == s_lon_s[posc]) & (mod_lat == s_lat_s[posc])
    else:
        found = np.zeros(len(mod_ids), dtype=bool)
        same = found
    created_nodes = np.unique(np.concatenate([created_nodes, mod_ids[~found]]))
    modified_nodes = np.unique(mod_ids[same])
    modified_nodes_loc_changed = np.unique(mod_ids[found & ~same])

    ways_in_cf = np.unique(np.concatenate([created_ways, modified_ways, deleted_ways]))
    rels_in_cf = np.unique(
        np.concatenate([created_relations, modified_relations, deleted_relations])
    )
    nodes_in_cf = np.unique(
        np.concatenate(
            [created_nodes, modified_nodes, modified_nodes_loc_changed, deleted_nodes]
        )
    )

    # --- J2: ways whose geometry is dirtied by moved nodes, excluding
    # ways already in the change file (OsmChangeHandler.cpp:215-229)
    if len(modified_nodes_loc_changed):
        ways_to_update = _setdiff(
            store.ways_referencing_nodes(modified_nodes_loc_changed), ways_in_cf
        )
    else:
        ways_to_update = empty

    # --- J3: relations dirtied by moved nodes or by updated ways
    # (OsmChangeHandler.cpp:232-285).  Inputs: loc-changed nodes and
    # modified_ways ∪ ways_to_update (NOT created ways — parity with
    # the reference's updatedWays construction at :250-255).  The
    # relation→relation hop is intentionally skipped (:270-285).
    updated_ways = np.unique(np.concatenate([modified_ways, ways_to_update]))
    rels_to_update = _setdiff(
        store.relations_referencing(modified_nodes_loc_changed, updated_ways),
        rels_in_cf,
    )

    # --- J7 (option-gated, default OFF = reference parity): relations
    # referencing dirty/changed RELATIONS — the reference's own
    # rel-of-rel query is dead code (OsmChangeHandler.cpp:289-304 has
    # no caller in run()); when enabled this follows ONE hop, matching
    # the dead code's shape (no transitive closure).
    if store.config.rel_of_rel_hop:
        seed = np.unique(np.concatenate([rels_in_cf, rels_to_update]))
        if len(seed):
            extra = _setdiff(
                store.relations_referencing_relations(seed), seed
            )
            rels_to_update = np.unique(
                np.concatenate([rels_to_update, extra])
            )

    # --- closure pass over change-file ways/relations
    # (ReferencesHandler::way/relation, ReferencesHandler.cpp:26-60)
    referenced_nodes_l: list[np.ndarray] = []
    referenced_ways_l: list[np.ndarray] = []
    referenced_rels_l: list[np.ndarray] = []
    cf_ways = changes.filter(pc.equal(changes.column("type"), "way"))
    nids_col = cf_ways.column("node_ids").combine_chunks()
    flat_nodes = pc.list_flatten(nids_col)
    if len(flat_nodes):
        referenced_nodes_l.append(np.unique(_np(flat_nodes)))
    cf_rels = changes.filter(pc.equal(changes.column("type"), "relation"))
    members = cf_rels.column("members").combine_chunks()
    flat_members = pc.list_flatten(members)
    if len(flat_members):
        refs = _np(flat_members.field("ref"))
        mtypes = np.asarray(flat_members.field("type").to_pylist(), dtype=object)
        referenced_nodes_l.append(np.unique(refs[mtypes == "node"]).astype(np.int64))
        referenced_ways_l.append(np.unique(refs[mtypes == "way"]).astype(np.int64))
        referenced_rels_l.append(
            np.unique(refs[mtypes == "relation"]).astype(np.int64)
        )

    def _merge(parts: list[np.ndarray]) -> np.ndarray:
        return np.unique(np.concatenate(parts)) if parts else empty

    referenced_nodes = _setdiff(_merge(referenced_nodes_l), nodes_in_cf)
    referenced_ways = _setdiff(_merge(referenced_ways_l), ways_in_cf)
    referenced_relations = _setdiff(_merge(referenced_rels_l), rels_in_cf)

    # --- J5: members of (referenced ∪ dirty) relations
    # (OsmChangeHandler.cpp:120-125 + ReferencesHandler.cpp:63-82)
    rel_closure_ids = np.unique(np.concatenate([referenced_relations, rels_to_update]))
    if len(rel_closure_ids):
        m_nodes, m_ways, _m_rels = store.relation_member_ids(rel_closure_ids)
        referenced_ways = np.unique(
            np.concatenate([referenced_ways, _setdiff(m_ways, ways_in_cf)])
        )
        referenced_nodes = np.unique(
            np.concatenate([referenced_nodes, _setdiff(m_nodes, nodes_in_cf)])
        )

    # --- J4: member nodes of (referenced ∪ dirty) ways
    # (OsmChangeHandler.cpp:128-130 + ReferencesHandler.cpp:85-99)
    way_closure_ids = np.unique(np.concatenate([referenced_ways, ways_to_update]))
    if len(way_closure_ids):
        m_nodes = store.way_member_nodes(way_closure_ids)
        referenced_nodes = np.unique(
            np.concatenate([referenced_nodes, _setdiff(m_nodes, nodes_in_cf)])
        )

    return DeltaPlan(
        created_nodes=created_nodes,
        modified_nodes=modified_nodes,
        modified_nodes_loc_changed=modified_nodes_loc_changed,
        deleted_nodes=deleted_nodes,
        created_ways=created_ways,
        modified_ways=modified_ways,
        deleted_ways=deleted_ways,
        created_relations=created_relations,
        modified_relations=modified_relations,
        modified_areas=modified_areas,
        deleted_relations=deleted_relations,
        ways_to_update_geometry=ways_to_update,
        relations_to_update_geometry=rels_to_update,
        referenced_nodes=referenced_nodes,
        referenced_ways=referenced_ways,
        referenced_relations=referenced_relations,
    )


def reconstruct(plan: DeltaPlan, store: StateStore) -> dict[str, pa.Table]:
    """J6: fetch full payload rows for referenced/dirty objects from
    state (reference createDummyNodes/Ways/Relations,
    OsmChangeHandler.cpp:305-369).  Missing rows are TOLERATED
    (regional-extract semantics :340-343, :365-368) — left-semi, never
    inner-with-assert.

    Returns {"nodes": ..., "ways": ..., "relations": ...} Arrow tables
    in the state schemas — the analog of the dummy XML files, kept as
    Arrow and unioned with the delta for geometry recomputation.
    """
    way_ids = np.unique(
        np.concatenate([plan.referenced_ways, plan.ways_to_update_geometry])
    )
    rel_ids = np.unique(
        np.concatenate([plan.referenced_relations, plan.relations_to_update_geometry])
    )
    return {
        "nodes": store.lookup("nodes", plan.referenced_nodes),
        "ways": store.lookup("ways", way_ids),
        "relations": store.lookup("relations", rel_ids),
    }
