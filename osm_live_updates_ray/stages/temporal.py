"""Temporal joins Ray Data has no native operator for: AS-OF join and
banded RANGE (interval) join over an event stream.

Both follow the same scale shape as the spatial partitioned join
(`spatial.spatial_join_partitioned`): the two inputs travel IN one
shuffle as a tagged union co-grouped on a partition key, and each
group runs a vectorized C kernel — no broadcast side, no driver-side
materialization, no per-row Python.

- **as-of**: co-partition both sides by ``hash(by) % n_buckets`` so a
  bucket holds every row of its users from BOTH sides; the in-group
  kernel is ``pandas.merge_asof`` (C merge over ts-sorted frames with
  per-user backtracking).  Buckets are count-balanced in expectation;
  a single pathological user is bounded by that user's own row count,
  which any by-key join shares.
- **range join**: band the TIME axis at the window length W, assign
  each probe row to exactly one band and replicate each window to the
  (at most 2) bands it overlaps; the in-group kernel is two
  ``np.searchsorted`` calls + exact integer-cents prefix sums.  Band
  partials are disjoint by construction (a probe row lives in one
  band), so the final per-window aggregate is a small groupby-sum of
  partials — the all-to-all is one event-sized shuffle, never the
  |windows| x |probes| cross product an unbanded range join costs.

The reference repo has no temporal-join analog (its streaming axis is
the OsmChange window machinery, `src/osm/OsmUpdater.cpp`); these are
the training-data-pipeline operators the engine adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str = "user_id",
    on: str = "ts",
    n_buckets: int = 32,
):
    """AS-OF inner join: for each left row, the single right row of the
    same ``by`` key with the greatest ``on`` <= left ``on``.

    Inputs must both carry (event_id, ts, user_id); right additionally
    carries ``value``.  Returns a Dataset with columns
    (purchase_id, prior_view_id, prior_view_value, gap_us) — the right
    pick is deterministic because (user_id, ts) is unique per side
    (enforced upstream; ties would make ANY as-of join, including
    DuckDB's, pick arbitrarily).
    """
    left_t = left_ds.map_batches(
        lambda t: t.select(["event_id", on, by]).append_column(
            "value", pa.nulls(t.num_rows, pa.float64())
        ).append_column("side", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    right_t = right_ds.map_batches(
        lambda t: t.select(["event_id", on, by, "value"]).append_column(
            "side", pa.array(np.ones(t.num_rows, np.int8))
        ),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        # splitmix-style avalanche so sequential ids spread across buckets
        h = (k * np.int64(-7046029254386353131)) >> np.int64(32)
        return t.append_column(
            "bucket", pa.array((h % n_buckets).astype(np.int64))
        )

    tagged = left_t.union(right_t).map_batches(add_bucket, batch_format="pyarrow")

    empty = pd.DataFrame(
        {
            "purchase_id": pd.Series(dtype=np.int64),
            "prior_view_id": pd.Series(dtype=np.int64),
            "prior_view_value": pd.Series(dtype=np.float64),
            "gap_us": pd.Series(dtype=np.int64),
        }
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["side"] == 0]
        rt = g[g["side"] == 1]
        if not len(lf) or not len(rt):
            return empty
        rt = rt[["event_id", on, by, "value"]].copy()
        # merge_asof emits a single `on` column (the left's) — carry the
        # matched right timestamp explicitly for the gap computation
        rt["ts_r"] = rt[on]
        m = pd.merge_asof(
            lf[["event_id", on, by]].sort_values(on, kind="stable"),
            rt.sort_values(on, kind="stable"),
            on=on, by=by, direction="backward", allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        m = m[m["event_id_r"].notna()]
        if not len(m):
            return empty
        gap = (
            m[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            - m["ts_r"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pd.DataFrame(
            {
                "purchase_id": m["event_id"].to_numpy(),
                "prior_view_id": m["event_id_r"].to_numpy().astype(np.int64),
                "prior_view_value": m["value"].to_numpy(),
                "gap_us": gap,
            }
        )

    return tagged.groupby("bucket").map_groups(merge, batch_format="pandas")


def banded_range_join(
    windows_ds,
    probes_ds,
    *,
    window_us: int,
    on: str = "ts",
):
    """Banded RANGE join + aggregate: for each window row w, count the
    probe rows with w.ts <= probe.ts < w.ts + window_us and sum their
    ``value`` (exact integer cents).  Inner semantics — windows with no
    probe inside are absent from the output.

    Band width == window length, so every window overlaps at most 2
    bands; probes land in exactly 1, making band partials disjoint
    (summable without dedup).  Returns (incident_id, n_probes, cents)
    partials AGGREGATED per incident.
    """
    from ray.data.aggregate import Sum

    def prep_windows(t: pa.Table) -> pa.Table:
        ts = t.column(on).to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        b0 = ts // window_us
        b1 = (ts + window_us - 1) // window_us
        dup = b1 != b0
        return pa.table(
            {
                "side": pa.array(
                    np.zeros(len(ts) + int(dup.sum()), np.int8)
                ),
                "event_id": pa.array(np.concatenate([ids, ids[dup]])),
                "ts_us": pa.array(np.concatenate([ts, ts[dup]])),
                "cents": pa.array(
                    np.zeros(len(ts) + int(dup.sum()), np.int64)
                ),
                "band": pa.array(np.concatenate([b0, b1[dup]])),
            }
        )

    def prep_probes(t: pa.Table) -> pa.Table:
        ts = t.column(on).to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "side": pa.array(np.ones(len(ts), np.int8)),
                "event_id": t.column("event_id"),
                "ts_us": pa.array(ts),
                "cents": pa.array(cents),
                "band": pa.array(ts // window_us),
            }
        )

    tagged = windows_ds.map_batches(
        prep_windows, batch_format="pyarrow"
    ).union(probes_ds.map_batches(prep_probes, batch_format="pyarrow"))

    empty = pd.DataFrame(
        {
            "incident_id": pd.Series(dtype=np.int64),
            "n": pd.Series(dtype=np.int64),
            "cents": pd.Series(dtype=np.int64),
        }
    )

    def band_partials(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["side"] == 0]
        p = g[g["side"] == 1]
        if not len(w) or not len(p):
            return empty
        order = np.argsort(p["ts_us"].to_numpy(), kind="stable")
        pt = p["ts_us"].to_numpy()[order]
        pc_ = p["cents"].to_numpy()[order]
        cs = np.concatenate([[0], np.cumsum(pc_)])
        wt = w["ts_us"].to_numpy()
        lo = np.searchsorted(pt, wt, side="left")
        hi = np.searchsorted(pt, wt + window_us, side="left")
        n = hi - lo
        keep = n > 0
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "incident_id": w["event_id"].to_numpy()[keep],
                "n": n[keep].astype(np.int64),
                "cents": (cs[hi] - cs[lo])[keep],
            }
        )

    partials = tagged.groupby("band").map_groups(
        band_partials, batch_format="pandas"
    )
    return partials.groupby("incident_id").aggregate(
        Sum("n", alias_name="n_probes"), Sum("cents", alias_name="cents")
    )
