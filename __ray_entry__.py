"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` happens here or in the library code these
callables use (only bench.py, CLI entry points and the pytest fixture
own a Ray session).

``queries()`` maps each implemented operator/pipeline from SURVEY.md §2
to a callable over an sf_dir of driver testdata; ``oracle_sql()`` maps
the same names to DuckDB-runnable SQL with IDENTICAL column names and
mirrored float semantics (see osm_live_updates_ray/sources/testdata.py
for the mirroring contract).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages -> geocode
    (actor pool, canonical html text/geo extraction) -> cell encode ->
    spatial join (point-in-polygon + exact grid kNN) -> tile-assignment
    rows.  Returns the assignments Dataset."""
    from osm_live_updates_ray import queries as q

    return q.QUERIES["assignments"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_live_updates_ray import queries as q

    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from osm_live_updates_ray import queries as q

    return dict(q.ORACLES)
