"""Adapter: driver testdata tables -> the engine's geospatial world.

The correctness gate runs each Ray pipeline AND an oracle SQL string
side-by-side over `/root/testdata/sf*` (tables region nation customer
supplier part orders lineitem events documents embeddings).  This
module derives the engine's world from those tables with DETERMINISTIC
formulas written twice — once in numpy, once in SQL — with IDENTICAL
floating-point expression trees, so outputs match bit-for-bit:

  pages       <- documents  (url, text, lang + formula lon/lat, skewed:
                             doc_id %% 5 == 0 lands in one mega-cell)
  osm nodes   <- part       (id = p_partkey, formula lon/lat)
  osm ways    <- lineitem   (way = l_orderkey, member node = l_partkey,
                             pos = l_linenumber)
  osm rels    <- orders     (rel = o_custkey, member way = o_orderkey)
  polygons    <- nation     (non-overlapping rects; edges at .005/.995
                             offsets so no page ever sits on a boundary
                             and BETWEEN == ray-cast semantics)
  changes     <- events     (action/type/id/version/ts formulas)

Never change a formula here without changing its SQL twin in the same
commit — they are one definition in two syntaxes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import text as textfn

# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------
def read(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# pages <- documents
# ---------------------------------------------------------------------------
def page_lonlat(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hot = doc_id % 5 == 0
    lon = np.where(
        hot,
        10.0 + ((doc_id * 37) % 800) / 1000.0,
        -180.0 + ((doc_id * 9001 + 17) % 36000) / 100.0,
    )
    lat = np.where(
        hot,
        50.0 + ((doc_id * 53) % 800) / 1000.0,
        -90.0 + ((doc_id * 7919 + 3) % 18000) / 100.0,
    )
    return lon, lat


SQL_PAGE_LON = (
    "CASE WHEN doc_id % 5 = 0 THEN 10.0 + ((doc_id * 37) % 800) / 1000.0 "
    "ELSE -180.0 + ((doc_id * 9001 + 17) % 36000) / 100.0 END"
)
SQL_PAGE_LAT = (
    "CASE WHEN doc_id % 5 = 0 THEN 50.0 + ((doc_id * 53) % 800) / 1000.0 "
    "ELSE -90.0 + ((doc_id * 7919 + 3) % 18000) / 100.0 END"
)

SQL_PAGES = f"""
pages AS (
  SELECT 'https://example.org/p/' || doc_id AS url,
         text, lang,
         {SQL_PAGE_LON} AS lon,
         {SQL_PAGE_LAT} AS lat
  FROM documents
)"""


def pages_table(sf_dir: str) -> pa.Table:
    """PAGES-schema table; html rendered so the engine's geocoder +
    extractor run for real (text byte-identity invariant)."""
    docs = read(sf_dir, "documents")
    doc_id = docs.column("doc_id").to_numpy(zero_copy_only=False)
    lon, lat = page_lonlat(doc_id)
    texts = docs.column("text").to_pylist()
    html = [
        textfn.render_html(t, lo, la)
        for t, lo, la in zip(texts, lon.tolist(), lat.tolist())
    ]
    ts = (np.int64(1704067200) + doc_id).astype("datetime64[s]")
    return pa.Table.from_pydict(
        {
            "url": [f"https://example.org/p/{i}" for i in doc_id.tolist()],
            "warc_ts": pa.array(ts, type=pa.timestamp("s")),
            "html": pa.array(html, type=pa.binary()),
            "text": docs.column("text"),
            "lang": docs.column("lang"),
        }
    )


# cell / tile encodings (mirror functions/cells.py at res 1.0 / 10.0)
SQL_CELL = (
    "CAST(FLOOR((lon + 180.0) / 1.0) AS BIGINT) * 4294967296 "
    "+ CAST(FLOOR((lat + 90.0) / 1.0) AS BIGINT)"
)
SQL_TILE = (
    "CAST(FLOOR((lon + 180.0) / 10.0) AS BIGINT) * 4294967296 "
    "+ CAST(FLOOR((lat + 90.0) / 10.0) AS BIGINT)"
)

# ---------------------------------------------------------------------------
# OSM node layer <- part
# ---------------------------------------------------------------------------
def node_lonlat(pk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = -180.0 + ((pk * 9973) % 36000) / 100.0
    lat = -90.0 + ((pk * 7919) % 18000) / 100.0
    return lon, lat


SQL_NODE_LON = "-180.0 + ((id * 9973) % 36000) / 100.0"
SQL_NODE_LAT = "-90.0 + ((id * 7919) % 18000) / 100.0"

SQL_STATE_NODES = f"""
state_nodes AS (
  SELECT p_partkey AS id,
         {SQL_NODE_LON.replace('id', 'p_partkey')} AS lon,
         {SQL_NODE_LAT.replace('id', 'p_partkey')} AS lat
  FROM part
)"""


def nodes_table(sf_dir: str) -> pa.Table:
    pk = read(sf_dir, "part", ["p_partkey"]).column("p_partkey").to_numpy(
        zero_copy_only=False
    )
    lon, lat = node_lonlat(pk)
    return pa.Table.from_pydict({"id": pk, "lon": lon, "lat": lat})


# ---------------------------------------------------------------------------
# way layer <- lineitem (edges) ; relation layer <- orders (edges)
# ---------------------------------------------------------------------------
SQL_WAY_EDGES = """
way_edges AS (
  SELECT l_orderkey AS way_id, l_partkey AS node_id, l_linenumber AS pos
  FROM lineitem
)"""

SQL_REL_EDGES = """
rel_edges AS (
  SELECT o_custkey AS rel_id, o_orderkey AS member_id, 'way' AS member_type,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pos
  FROM orders
)"""


def way_edges(sf_dir: str) -> pa.Table:
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"])
    return li.rename_columns(["way_id", "node_id", "pos"])


def rel_edges(sf_dir: str) -> pa.Table:
    o = read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).sort_by(
        [("o_custkey", "ascending"), ("o_orderkey", "ascending")]
    )
    ck = o.column("o_custkey").to_numpy(zero_copy_only=False)
    pos = np.ones(len(ck), dtype=np.int64)
    starts = np.flatnonzero(np.diff(ck)) + 1
    # running position within each custkey group
    idx = np.arange(len(ck), dtype=np.int64)
    group_start = np.zeros(len(ck), dtype=np.int64)
    group_start[starts] = starts
    group_start = np.maximum.accumulate(group_start)
    pos = idx - group_start + 1
    return pa.Table.from_pydict(
        {
            "rel_id": ck,
            "member_id": o.column("o_orderkey"),
            "member_type": ["way"] * len(ck),
            "pos": pos,
        }
    )


# ---------------------------------------------------------------------------
# nation rectangles (the polygon layer for PIP)
# edges at *.005 / *.995 — never equal to a page coordinate (pages have
# at most 3 decimals ending in 0.00x via /100 or /1000 of integers,
# while 5.005+72k etc. are distinct), so BETWEEN == ray-cast.
# ---------------------------------------------------------------------------
SQL_NATION_RECTS = """
nation_rects AS (
  SELECT n_nationkey AS polygon_id,
         -180e0 + (n_nationkey % 5) * 72e0 + 5.005e0 AS min_lon,
         -180e0 + (n_nationkey % 5) * 72e0 + 5.005e0 + 61.99e0 AS max_lon,
         -90e0 + CAST(FLOOR(n_nationkey / 5.0) AS BIGINT) * 36e0 + 3.005e0 AS min_lat,
         -90e0 + CAST(FLOOR(n_nationkey / 5.0) AS BIGINT) * 36e0 + 3.005e0 + 29.99e0 AS max_lat
  FROM nation
)"""


def nation_rects(sf_dir: str) -> pa.Table:
    nk = read(sf_dir, "nation", ["n_nationkey"]).column("n_nationkey").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    min_lon = -180.0 + (nk % 5) * 72.0 + 5.005
    max_lon = -180.0 + (nk % 5) * 72.0 + 5.005 + 61.99
    min_lat = -90.0 + np.floor(nk / 5.0).astype(np.int64) * 36.0 + 3.005
    max_lat = -90.0 + np.floor(nk / 5.0).astype(np.int64) * 36.0 + 3.005 + 29.99
    return pa.Table.from_pydict(
        {
            "polygon_id": nk,
            "min_lon": min_lon,
            "max_lon": max_lon,
            "min_lat": min_lat,
            "max_lat": max_lat,
        }
    )


def nation_rings(sf_dir: str) -> pa.Table:
    """nation rects as POLYGON_RINGS rows for the engine's PolygonIndex."""
    from ..functions import geo
    from ..stages.geometry import POLYGON_RINGS

    r = nation_rects(sf_dir)
    rows = []
    for pid, a, b, c, d in zip(
        r.column("polygon_id").to_pylist(),
        r.column("min_lon").to_pylist(),
        r.column("max_lon").to_pylist(),
        r.column("min_lat").to_pylist(),
        r.column("max_lat").to_pylist(),
    ):
        x = np.array([a, b, b, a, a])
        y = np.array([c, c, d, d, c])
        rows.append(
            {
                "polygon_id": pid,
                "ring_idx": 0,
                "role": "outer",
                "lons": x.tolist(),
                "lats": y.tolist(),
                "min_lon": a,
                "min_lat": c,
                "max_lon": b,
                "max_lat": d,
                "area": geo.ring_area(x, y),
            }
        )
    return pa.Table.from_pylist(rows, schema=POLYGON_RINGS)


# ---------------------------------------------------------------------------
# change window <- events
# ---------------------------------------------------------------------------
SQL_CHANGES = """
n_node AS (SELECT COUNT(*) AS c FROM part),
n_way AS (SELECT COUNT(*) AS c FROM orders),
n_rel AS (SELECT COUNT(DISTINCT o_custkey) AS c FROM orders),
changes AS (
  SELECT
    event_id,
    event_id % 4 AS seq,
    ts,
    CAST(1 + event_id % 3 AS INTEGER) AS version,
    CASE WHEN event_type = 'error' THEN 'delete'
         WHEN 1 + event_id % 3 = 1 THEN 'create'
         ELSE 'modify' END AS action,
    CASE WHEN user_id % 5 < 3 THEN 'node'
         WHEN user_id % 5 = 3 THEN 'way'
         ELSE 'relation' END AS type,
    CASE WHEN user_id % 5 < 3 THEN (event_id * 7) % ((SELECT c FROM n_node) + 500)
         WHEN user_id % 5 = 3 THEN (event_id * 11) % ((SELECT c FROM n_way) + 1000)
         ELSE (event_id * 13) % ((SELECT c FROM n_rel) + 100) END AS id
  FROM events
),
changes_geo AS (
  SELECT c.*,
    CASE WHEN c.type = 'node' THEN
      CASE WHEN c.event_id % 4 = 0 THEN -180.0 + ((c.id * 9973) % 36000) / 100.0
           ELSE -180.0 + ((c.id * 9973 + c.event_id * 31 + 700) % 36000) / 100.0 END
    END AS lon,
    CASE WHEN c.type = 'node' THEN
      CASE WHEN c.event_id % 4 = 0 THEN -90.0 + ((c.id * 7919) % 18000) / 100.0
           ELSE -90.0 + ((c.id * 7919 + c.event_id * 57 + 300) % 18000) / 100.0 END
    END AS lat
  FROM changes c
),
deduped AS (
  SELECT * FROM (
    SELECT cg.*,
      ROW_NUMBER() OVER (
        PARTITION BY cg.type, cg.id
        ORDER BY cg.version DESC,
                 CASE WHEN cg.action = 'delete' THEN 1 ELSE 0 END DESC,
                 cg.ts DESC, cg.event_id DESC
      ) AS rn
    FROM changes_geo cg
  ) WHERE rn = 1
)"""

#: members of a CHANGED way w (deterministic formula), j = 0..(w%4+2):
#:   node_id = (w*3 + j*17) % n_node
SQL_CHANGED_WAY_MEMBERS = """
changed_way_members AS (
  SELECT d.id AS way_id,
         (d.id * 3 + j.j * 17) % (SELECT c FROM n_node) AS node_id,
         j.j AS pos
  FROM deduped d
  CROSS JOIN (SELECT UNNEST(range(0, 7)) AS j) j
  WHERE d.type = 'way' AND d.action <> 'delete' AND j.j <= d.id % 4 + 2
)"""

#: members of a CHANGED relation r, j = 0..(r%3+1): way (r*5 + j*23) % n_way
SQL_CHANGED_REL_MEMBERS = """
changed_rel_members AS (
  SELECT d.id AS rel_id,
         (d.id * 5 + j.j * 23) % (SELECT c FROM n_way) AS member_id,
         'way' AS member_type,
         j.j AS pos
  FROM deduped d
  CROSS JOIN (SELECT UNNEST(range(0, 6)) AS j) j
  WHERE d.type = 'relation' AND d.action <> 'delete' AND j.j <= d.id % 3 + 1
)"""


def changes_table(sf_dir: str) -> pa.Table:
    """The change window as an Arrow table (numpy mirror of SQL_CHANGES),
    including per-row payload columns."""
    ev = read(sf_dir, "events", ["event_id", "ts", "event_type", "user_id"])
    eid = ev.column("event_id").to_numpy(zero_copy_only=False)
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)
    etype = np.asarray(ev.column("event_type").to_pylist(), dtype=object)
    n_node = read(sf_dir, "part", ["p_partkey"]).num_rows
    n_way = read(sf_dir, "orders", ["o_orderkey"]).num_rows
    n_rel = len(
        np.unique(
            read(sf_dir, "orders", ["o_custkey"]).column("o_custkey").to_numpy(
                zero_copy_only=False
            )
        )
    )
    version = (1 + eid % 3).astype(np.int32)
    action = np.where(
        etype == "error", "delete", np.where(version == 1, "create", "modify")
    )
    tsel = uid % 5
    otype = np.where(tsel < 3, "node", np.where(tsel == 3, "way", "relation"))
    oid = np.where(
        tsel < 3,
        (eid * 7) % (n_node + 500),
        np.where(tsel == 3, (eid * 11) % (n_way + 1000), (eid * 13) % (n_rel + 100)),
    ).astype(np.int64)
    keep = eid % 4 == 0
    lon = np.where(
        keep,
        -180.0 + ((oid * 9973) % 36000) / 100.0,
        -180.0 + ((oid * 9973 + eid * 31 + 700) % 36000) / 100.0,
    )
    lat = np.where(
        keep,
        -90.0 + ((oid * 7919) % 18000) / 100.0,
        -90.0 + ((oid * 7919 + eid * 57 + 300) % 18000) / 100.0,
    )
    is_node = otype == "node"
    return pa.Table.from_pydict(
        {
            "event_id": eid,
            "seq": (eid % 4).astype(np.int32),
            "ts": ev.column("ts"),
            "version": pa.array(version),
            "action": action.tolist(),
            "type": otype.tolist(),
            "id": oid,
            "lon": pa.array(np.where(is_node, lon, np.nan)),
            "lat": pa.array(np.where(is_node, lat, np.nan)),
        }
    )


def changed_way_member_lists(ids: np.ndarray, n_node: int) -> list[list[int]]:
    return [
        [int((w * 3 + j * 17) % n_node) for j in range(int(w % 4 + 3))]
        for w in ids.tolist()
    ]


def changed_rel_member_lists(ids: np.ndarray, n_way: int) -> list[list[int]]:
    return [
        [int((r * 5 + j * 23) % n_way) for j in range(int(r % 3 + 2))]
        for r in ids.tolist()
    ]


#: the full WITH prelude shared by the delta-semantics oracle queries
def sql_prelude(*extra: str) -> str:
    parts = [
        SQL_CHANGES.strip(),
        SQL_STATE_NODES.strip(),
        SQL_WAY_EDGES.strip(),
        SQL_REL_EDGES.strip(),
        SQL_CHANGED_WAY_MEMBERS.strip(),
        SQL_CHANGED_REL_MEMBERS.strip(),
        *[e.strip() for e in extra],
    ]
    return "WITH " + ",\n".join(parts)
