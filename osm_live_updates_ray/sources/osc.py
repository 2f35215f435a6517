"""OsmChange (.osc / .osc.gz) XML -> Arrow delta table.

The reference streams change files with libosmium in three typed
passes (reference: src/osm/OsmChangeHandler.cpp:67-92).  Here a change
file becomes ONE Arrow table in the OSM_CHANGES schema — the
``<create|modify|delete>`` wrapper column-ized as ``action`` — and all
downstream semantics operate relationally on that table.

For many files at scale use :func:`read_osc_dataset`:
``ray.data.read_binary_files(paths) -> flat_map(parse)`` so each file
parses in its own task.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pyarrow as pa

from ..schemas import OSM_CHANGES

_ACTIONS = ("create", "modify", "delete")
_TYPES = ("node", "way", "relation")


def _parse_ts(s: str | None):
    if not s:
        return None
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)


def parse_osc_bytes(data: bytes, seq: int = 0) -> pa.Table:
    """Parse one OsmChange XML document into an OSM_CHANGES Arrow table."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    root = ET.fromstring(data)
    rows: dict[str, list] = {name: [] for name in OSM_CHANGES.names}

    def emit(action: str, el: ET.Element) -> None:
        otype = el.tag
        if otype not in _TYPES:
            return
        rows["seq"].append(seq)
        rows["action"].append(action)
        rows["type"].append(otype)
        rows["id"].append(int(el.get("id")))
        rows["version"].append(int(el.get("version", "0")))
        ts = _parse_ts(el.get("timestamp"))
        rows["ts"].append(ts.replace(tzinfo=None) if ts else None)
        lon = el.get("lon")
        lat = el.get("lat")
        rows["lon"].append(float(lon) if lon is not None else None)
        rows["lat"].append(float(lat) if lat is not None else None)
        if otype == "way":
            nds = [int(nd.get("ref")) for nd in el.findall("nd")]
            rows["node_ids"].append(nds)
        else:
            rows["node_ids"].append(None)
        if otype == "relation":
            members = [
                {
                    "ref": int(m.get("ref")),
                    "type": m.get("type"),
                    "role": m.get("role", ""),
                }
                for m in el.findall("member")
            ]
            rows["members"].append(members)
        else:
            rows["members"].append(None)
        tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
        rows["tags"].append(tags if tags else [])

    for wrapper in root:
        if wrapper.tag in _ACTIONS:
            for el in wrapper:
                emit(wrapper.tag, el)
        elif wrapper.tag in _TYPES:
            # bare objects (plain .osm snapshot) => treat as create
            emit("create", wrapper)

    return pa.Table.from_pydict(rows, schema=OSM_CHANGES)


def read_osc_file(path: str, seq: int = 0) -> pa.Table:
    with open(path, "rb") as f:
        return parse_osc_bytes(f.read(), seq=seq)


def read_osc_dataset(paths: list[str]):
    """Many change files -> one Ray Dataset (one parse task per file;
    ``seq`` taken from the position in the sorted path list, matching
    the reference's sequence-ordered merge window)."""
    import ray.data as rd

    ordered = {p: i for i, p in enumerate(sorted(paths))}

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_osc_bytes(data.as_py(), seq=ordered[path.as_py()])
            for path, data in zip(batch["path"], batch["bytes"])
        ]
        return pa.concat_tables(tables) if tables else OSM_CHANGES.empty_table()

    ds = rd.read_binary_files(sorted(paths), include_paths=True)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)
