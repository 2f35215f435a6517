"""Canonical Arrow schemas for every table the engine touches.

Data model mirrors the reference's three-logical-table universe
(reference: include/osm/OsmObjectType.h, include/util/Types.h:30-38)
plus the web-page payload table shape mandated by BASELINE.json's
``input_hint`` and the derived/output tables from FIXTURES.md.

Deviations from FIXTURES.md (documented):
  * ``cell_id`` / ``tile_id`` are int64, not uint64 — values fit
    easily (cell_id = ix<<32 | iy with ix<2880) and int64 keeps DuckDB
    oracle comparisons type-identical.
"""

from __future__ import annotations

import pyarrow as pa

TAGS = pa.map_(pa.string(), pa.string())
MEMBER = pa.struct(
    [("ref", pa.int64()), ("type", pa.string()), ("role", pa.string())]
)

# ---------------------------------------------------------------------------
# payload table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("text", pa.string()),  # INVARIANT: byte-identical per url
        ("lang", pa.string()),
    ]
)

PAGES_GEO = pa.schema(
    list(PAGES)
    + [
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("cell_id", pa.int64()),
        ("tile_id", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# OSM layer state tables (reference: include/osm/Node.h, XmlHelper.cpp:29-106)
# ---------------------------------------------------------------------------
OSM_NODES = pa.schema(
    [
        ("id", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("tags", TAGS),
        ("version", pa.int32()),
        ("ts", pa.timestamp("s")),
    ]
)

OSM_WAYS = pa.schema(
    [
        ("id", pa.int64()),
        ("node_ids", pa.list_(pa.int64())),  # ordered, like <nd ref=.../>
        ("tags", TAGS),
        ("version", pa.int32()),
        ("ts", pa.timestamp("s")),
    ]
)

OSM_RELATIONS = pa.schema(
    [
        ("id", pa.int64()),
        ("members", pa.list_(MEMBER)),  # ordered; role may be ""
        ("tags", TAGS),  # tags["type"] in {multipolygon, boundary} => area
        ("version", pa.int32()),
        ("ts", pa.timestamp("s")),
    ]
)

# Exploded edge tables — the scalable representation of membership used
# by the reverse-reference semi-joins (reference J2-J5,
# src/sparql/QueryWriter.cpp:316-396 expressed as SPARQL; here they are
# first-class hash-partitioned tables).
WAY_MEMBERS = pa.schema(
    [("way_id", pa.int64()), ("node_id", pa.int64()), ("pos", pa.int32())]
)
REL_MEMBERS = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("member_type", pa.string()),  # "node" | "way" | "relation"
        ("member_id", pa.int64()),
        ("role", pa.string()),
        ("pos", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# delta table (OsmChange batch in table form; FIXTURES.md §3)
# ---------------------------------------------------------------------------
OSM_CHANGES = pa.schema(
    [
        ("seq", pa.int32()),
        ("action", pa.string()),  # "create" | "modify" | "delete"
        ("type", pa.string()),  # "node" | "way" | "relation"
        ("id", pa.int64()),
        ("version", pa.int32()),
        ("ts", pa.timestamp("s")),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("node_ids", pa.list_(pa.int64())),
        ("members", pa.list_(MEMBER)),
        ("tags", TAGS),
    ]
)

# ---------------------------------------------------------------------------
# derived / output tables
# ---------------------------------------------------------------------------
#: per-object derived geometry facts — the engine's analog of the
#: osm2rdf triple categories the reference deletes/recomputes per
#: object (reference: src/osm/OsmChangeHandler.cpp:433-642; namespaces
#: include/config/Constants.h:164-318).  One row per object, columns
#: instead of triples.
GEOMS = pa.schema(
    [
        ("type", pa.string()),
        ("id", pa.int64()),
        ("wkt", pa.string()),  # canonical 7-decimal WKT
        ("centroid_lon", pa.float64()),
        ("centroid_lat", pa.float64()),
        ("env_min_lon", pa.float64()),
        ("env_min_lat", pa.float64()),
        ("env_max_lon", pa.float64()),
        ("env_max_lat", pa.float64()),
        ("convex_hull_wkt", pa.string()),
        ("obb_wkt", pa.string()),  # oriented bbox (option-gated, off by default)
        ("length", pa.float64()),
        ("area", pa.float64()),
    ]
)

PAGE_TILE_ASSIGNMENTS = pa.schema(
    [
        ("url", pa.string()),
        ("cell_id", pa.int64()),
        ("polygon_id", pa.int64()),  # containing area id, -1 if none
        ("knn_node_id", pa.int64()),  # nearest OSM node, -1 if no nodes
        ("knn_dist", pa.float64()),  # squared planar degree distance
        ("tile_id", pa.int64()),
    ]
)

#: the STATE variant additionally stores the page position so the delta
#: path can compute EXACT per-page kNN invalidation (dist to each new
#: node vs the stored knn_dist) without re-reading the pages table.
ASSIGNMENTS_STATE = PAGE_TILE_ASSIGNMENTS.append(
    pa.field("lon", pa.float64())
).append(pa.field("lat", pa.float64()))

DIRTY_SETS = pa.schema(
    [
        ("type", pa.string()),
        ("id", pa.int64()),
        ("bucket", pa.string()),
        # bucket in {created, modified, modified_loc_changed, deleted,
        #   ways_to_update_geometry, relations_to_update_geometry,
        #   referenced_nodes, referenced_ways, referenced_relations}
    ]
)
