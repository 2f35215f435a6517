"""osm_live_updates_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of
ad-freiburg/osm-live-updates (reference at /root/reference, read-only)
on top of ``ray.data.Dataset``: pages are geocoded and cell-indexed,
spatially joined to OSM-derived node/way/relation layers, and
OsmChange-style delta batches are replayed incrementally so that only
the affected cells/tiles are recomputed.

Nothing here is a port: the reference is a single-process C++ tool that
talks to a SPARQL endpoint; this engine expresses every stage as a
batch transform over Arrow blocks with explicit shuffle/broadcast
decisions, designed for a multi-node Ray cluster streaming Parquet.

Layout:
  functions/  pure, vectorized kernels (cells, geometry, hashing, text)
  sources/    readers (OsmChange XML, testdata adapter, synthetic gen)
  stages/     Dataset -> Dataset transforms (classify, dedup, cascade,
              reconstruct, spatial join, tiles, text dedup, similarity)
  pipelines/  end-to-end compositions (static join, delta update)
  state/      Parquet state store + manifest / lineage / watermark
"""

__version__ = "0.1.0"

# Ray workers import this package by name; make sure any Ray session
# initialized AFTER this import propagates the package location to its
# workers (driver-side sys.path edits don't).  No-op when already set.
import os as _os

_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _parent not in _pp.split(":"):
    _os.environ["PYTHONPATH"] = f"{_parent}:{_pp}" if _pp else _parent
del _os, _parent, _pp
