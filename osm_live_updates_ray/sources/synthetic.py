"""Deterministic synthetic world generator (seed-pure).

Generates the three FIXTURES.md tiers — pages (with a ~20% skew
hotspot in one mega-cell, exercising salted repartitioning), OSM
node/way/relation layers, and OsmChange delta batches.  Same seed =>
byte-identical tables.  Used by pytest fixtures (t1), the
single-process-oracle comparisons (t2) and bench.py (1M pages, built
as a Ray pipeline writing partitioned Parquet to a /tmp cache).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import text as textfn
from ..schemas import OSM_CHANGES, OSM_NODES, OSM_RELATIONS, OSM_WAYS, PAGES

_WORDS = (
    "data query batch stream table row column join merge sort hash index "
    "cell tile page node way relation delta update geometry point polygon "
    "line tag member version create modify delete cluster shuffle actor "
    "block arrow parquet vector raster city street river park border"
).split()

HOTSPOT_LON = 10.0
HOTSPOT_LAT = 50.0


def _rng_words(idx: np.ndarray, n_words: np.ndarray) -> list[str]:
    """Deterministic pseudo-text per index (pure function of idx)."""
    out = []
    for i, nw in zip(idx.tolist(), n_words.tolist()):
        state = (i * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        words = []
        for _ in range(nw):
            state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
            words.append(_WORDS[(state >> 33) % len(_WORDS)])
        out.append(" ".join(words))
    return out


def page_coords(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic page coordinates; idx % 5 == 0 (20%) land inside
    one 1-degree mega-cell at (10E, 50N)."""
    hot = idx % 5 == 0
    lon = np.where(
        hot,
        HOTSPOT_LON + ((idx * 37) % 800) / 1000.0,
        -180.0 + ((idx * 9973) % 36000) / 100.0,
    )
    lat = np.where(
        hot,
        HOTSPOT_LAT + ((idx * 53) % 800) / 1000.0,
        -90.0 + ((idx * 7919) % 18000) / 100.0,
    )
    return lon, lat


def gen_pages_idx(idx: np.ndarray) -> pa.Table:
    """Pages for an arbitrary index array (pure; used by parallel Ray
    generation in bench.py)."""
    idx = np.asarray(idx, dtype=np.int64)
    lon, lat = page_coords(idx)
    n_words = 20 + (idx % 80)
    texts = _rng_words(idx, n_words)
    urls = [f"https://example.org/p/{i:08d}" for i in idx.tolist()]
    htmls = [
        textfn.render_html(t, lo, la)
        for t, lo, la in zip(texts, lon.tolist(), lat.tolist())
    ]
    langs = [("en", "de", "fr", "es", "zh")[int(i) % 5] for i in idx]
    ts = (np.int64(1704067200) + idx % 86400).astype("datetime64[s]")
    return pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("s")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": texts,
            "lang": langs,
        },
        schema=PAGES,
    )


def gen_pages(start: int, count: int) -> pa.Table:
    """Pages [start, start+count) in the PAGES schema."""
    return gen_pages_idx(np.arange(start, start + count, dtype=np.int64))


NODES_PER_GROUP = 16


def node_coords(node_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Locality-aware node coordinates: nodes come in groups of 16
    sharing a ~0.02-degree anchor neighbourhood (building/block scale,
    like real OSM features), so ways built from one group form SMALL
    geometries; 20% of groups anchor inside the hotspot mega-cell."""
    g = node_id // NODES_PER_GROUP
    hot = g % 5 == 0
    # per-group anchor: spread WITHIN the hotspot cell for hot groups
    anchor_lon = np.where(
        hot,
        HOTSPOT_LON + ((g * 7919) % 900) / 1000.0,
        -180.0 + ((g * 6151) % 35900) / 100.0,
    )
    anchor_lat = np.where(
        hot,
        HOTSPOT_LAT + ((g * 6151) % 900) / 1000.0,
        -90.0 + ((g * 4423) % 17900) / 100.0,
    )
    # per-node jitter: feature-scale (~0.02 deg)
    lon = anchor_lon + ((node_id * 29) % 20) / 1000.0
    lat = anchor_lat + ((node_id * 31) % 20) / 1000.0
    return lon, lat


def gen_osm_nodes(n: int) -> pa.Table:
    ids = np.arange(n, dtype=np.int64)
    lon, lat = node_coords(ids)
    ts = (np.int64(1700000000) + ids).astype("datetime64[s]")
    tags = [[("name", f"n{i}")] if i % 10 == 0 else [] for i in ids.tolist()]
    return pa.Table.from_pydict(
        {
            "id": ids,
            "lon": lon,
            "lat": lat,
            "tags": tags,
            "version": pa.array((1 + ids % 3).astype(np.int32)),
            "ts": pa.array(ts, type=pa.timestamp("s")),
        },
        schema=OSM_NODES,
    )


def way_member_ids(way_id: int, n_nodes: int) -> list[int]:
    """Deterministic ordered member nodes of a way (3-8 nodes).  Tagged
    ways (way_id % 3 == 0) are CLOSED rings — they become polygons in
    the spatial-join layer."""
    k = 3 + way_id % 6
    # ways only reference EVEN node groups; deletes in gen_changes only
    # target ODD-group nodes.  This mirrors real OSM (a node still
    # referenced is never deleted) and keeps fixture conformance exact:
    # in the reference, deleted nodes do NOT dirty referencing ways
    # (J2 input is only modified-with-changed-location,
    # /root/reference/src/osm/OsmChangeHandler.cpp:215-229).
    n_groups = max(2, n_nodes // NODES_PER_GROUP)
    base = (((way_id * 131) % (n_groups // 2)) * 2) * NODES_PER_GROUP
    ids = [base + ((way_id + j * 7) % NODES_PER_GROUP) for j in range(k)]
    ids = [i % n_nodes for i in ids]
    # dedup consecutive repeats while preserving order
    out: list[int] = []
    for i in ids:
        if not out or out[-1] != i:
            out.append(i)
    if way_id % 3 == 0 and len(out) >= 3:
        out.append(out[0])
    return out


def gen_osm_ways(n: int, n_nodes: int) -> pa.Table:
    ids = np.arange(n, dtype=np.int64)
    node_ids = [way_member_ids(int(w), n_nodes) for w in ids]
    tags = [
        [("highway", "residential")] if w % 3 == 0 else [] for w in ids.tolist()
    ]
    ts = (np.int64(1700100000) + ids).astype("datetime64[s]")
    return pa.Table.from_pydict(
        {
            "id": ids,
            "node_ids": node_ids,
            "tags": tags,
            "version": pa.array((1 + ids % 2).astype(np.int32)),
            "ts": pa.array(ts, type=pa.timestamp("s")),
        },
        schema=OSM_WAYS,
    )


def rel_member_list(rel_id: int, n_ways: int, n_nodes: int) -> list[dict]:
    """Deterministic relation members: 2-4 ways (+1 node for every 4th
    relation).  Relation-of-relation membership exists for every 7th
    relation — the cascade must NOT recurse through it (reference
    cutoff: src/osm/OsmChangeHandler.cpp:270-285).

    Referenced ways come from [0, n_ways//2) and node members from
    EVEN node groups — the delete actions in gen_changes target the
    complementary ranges, matching the reference's cascade semantics
    (deletes never dirty referrers)."""
    k = 2 + rel_id % 3
    half = max(1, n_ways // 2)
    members = [
        {"ref": (rel_id * 57 + j * 13) % half, "type": "way",
         "role": "outer" if j == 0 else "inner"}
        for j in range(k)
    ]
    if rel_id % 4 == 0:
        n_groups = max(2, n_nodes // NODES_PER_GROUP)
        nid = (((rel_id * 11) % (n_groups // 2)) * 2) * NODES_PER_GROUP + (
            rel_id % NODES_PER_GROUP
        )
        members.append({"ref": nid, "type": "node", "role": "admin_centre"})
    if rel_id % 7 == 0 and rel_id > 0:
        members.append({"ref": rel_id - 1, "type": "relation", "role": "subarea"})
    return members


def gen_osm_relations(n: int, n_ways: int, n_nodes: int) -> pa.Table:
    ids = np.arange(n, dtype=np.int64)
    members = [rel_member_list(int(r), n_ways, n_nodes) for r in ids]
    # every 3rd relation is an area (multipolygon/boundary) — reference
    # flags these via the type tag (src/osm/RelationHandler.cpp:43-47)
    tags = []
    for r in ids.tolist():
        if r % 3 == 0:
            tags.append([("type", "multipolygon" if r % 6 == 0 else "boundary")])
        else:
            tags.append([("type", "route")])
    ts = (np.int64(1700200000) + ids).astype("datetime64[s]")
    return pa.Table.from_pydict(
        {
            "id": ids,
            "members": members,
            "tags": tags,
            "version": pa.array((1 + ids % 2).astype(np.int32)),
            "ts": pa.array(ts, type=pa.timestamp("s")),
        },
        schema=OSM_RELATIONS,
    )


def gen_changes(
    n: int, n_nodes: int, n_ways: int, n_rels: int, seed_offset: int = 0
) -> pa.Table:
    """A delta batch: n change rows over the layer id spaces, including
    ids ABSENT from the state (exercising modify-of-absent => create,
    reference src/osm/NodeHandler.cpp:70-76) and (type,id) collisions
    (exercising last-version dedup)."""
    i = np.arange(n, dtype=np.int64) + seed_offset
    tsel = i % 5
    otype = np.where(tsel < 3, "node", np.where(tsel == 3, "way", "relation"))
    version = (1 + i % 3).astype(np.int32)
    deleted = (i % 11) == 0
    action = np.where(deleted, "delete", np.where(version == 1, "create", "modify"))
    # id selection per (type, action), conformance-safe (see
    # way_member_ids / rel_member_list docstrings):
    #  * creates use ids ABSENT from the state (fresh ids), like real OSM
    #  * node deletes target odd-group nodes (never referenced)
    #  * way deletes target [n_ways//2, n_ways) (never in relations)
    #  * modifies roam 25% past the state range => some are absent,
    #    exercising modify-of-absent reclassification
    n_groups = max(2, n_nodes // NODES_PER_GROUP)
    node_mod = (i * 7) % max(1, int(n_nodes * 1.25))
    node_new = n_nodes + (i * 7) % max(1, n_nodes // 4)
    node_del = (
        (((i * 7) % max(1, n_groups // 2)) * 2 + 1) * NODES_PER_GROUP
        + (i % NODES_PER_GROUP)
    ) % n_nodes
    way_mod = (i * 11) % max(1, int(n_ways * 1.25))
    way_new = n_ways + (i * 11) % max(1, n_ways // 4)
    way_del = n_ways // 2 + (i * 11) % max(1, n_ways - n_ways // 2)
    rel_mod = (i * 13) % max(1, int(n_rels * 1.25))
    rel_new = n_rels + (i * 13) % max(1, n_rels // 4)
    rel_del = (i * 13) % max(1, n_rels)
    node_id_ = np.where(deleted, node_del, np.where(version == 1, node_new, node_mod))
    way_id_ = np.where(deleted, way_del, np.where(version == 1, way_new, way_mod))
    rel_id_ = np.where(deleted, rel_del, np.where(version == 1, rel_new, rel_mod))
    oid = np.where(
        tsel < 3, node_id_, np.where(tsel == 3, way_id_, rel_id_)
    ).astype(np.int64)
    # node payloads: every 4th change keeps the state location (no
    # geometry cascade); the rest move LOCALLY (~0.01 deg, like real
    # OSM edits — a node never teleports across the planet)
    slon, slat = node_coords(oid)
    mlon = slon + ((i % 21) - 10) / 1000.0
    mlat = slat + ((i % 17) - 8) / 1000.0
    keep = (i % 4) == 0
    lon = np.where(keep, slon, mlon)
    lat = np.where(keep, slat, mlat)
    is_node = otype == "node"
    rows = {
        "seq": pa.array((i % 4).astype(np.int32)),
        "action": action.tolist(),
        "type": otype.tolist(),
        "id": oid,
        "version": pa.array(version),
        "ts": pa.array(
            (np.int64(1705000000) + i).astype("datetime64[s]"), type=pa.timestamp("s")
        ),
        "lon": pa.array(np.where(is_node, lon, np.nan)).to_pylist(),
        "lat": pa.array(np.where(is_node, lat, np.nan)).to_pylist(),
        "node_ids": [
            way_member_ids(int(x), n_nodes) if t == "way" and a != "delete" else None
            for x, t, a in zip(oid.tolist(), otype.tolist(), action.tolist())
        ],
        "members": [
            rel_member_list(int(x), n_ways, n_nodes)
            if t == "relation" and a != "delete"
            else None
            for x, t, a in zip(oid.tolist(), otype.tolist(), action.tolist())
        ],
        "tags": [
            (
                [("type", "multipolygon" if x % 6 == 0 else "boundary")]
                if t == "relation" and x % 3 == 0
                else [("type", "route")] if t == "relation" else [("note", "changed")]
            )
            for x, t in zip(oid.tolist(), otype.tolist())
        ],
    }
    # NaN -> null for non-node rows
    rows["lon"] = [None if (v != v) else v for v in rows["lon"]]
    rows["lat"] = [None if (v != v) else v for v in rows["lat"]]
    return pa.Table.from_pydict(rows, schema=OSM_CHANGES)


# tier presets (FIXTURES.md §6)
TIERS = {
    "t1": dict(pages=1_000, nodes=500, ways=100, rels=20, delta=30),
    "t2": dict(pages=50_000, nodes=20_000, ways=4_000, rels=500, delta=1_000),
    "bench": dict(pages=1_000_000, nodes=200_000, ways=40_000, rels=5_000, delta=10_000),
}


def gen_world(tier: str) -> dict[str, pa.Table]:
    """Small tiers fully in memory (t1/t2).  For 'bench' use
    :mod:`bench` which generates pages with a parallel Ray pipeline."""
    t = TIERS[tier]
    return {
        "pages": gen_pages(0, t["pages"]),
        "osm_nodes": gen_osm_nodes(t["nodes"]),
        "osm_ways": gen_osm_ways(t["ways"], t["nodes"]),
        "osm_relations": gen_osm_relations(t["rels"], t["ways"], t["nodes"]),
        "changes": gen_changes(t["delta"], t["nodes"], t["ways"], t["rels"]),
    }
