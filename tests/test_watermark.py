"""Watermark decision tree parity (reference
src/osm/OsmUpdater.cpp:169-236 + the up-to-date early exit :115-120):
user seq > user ts > stored-watermark(+1 same source / ts-mapped
different source) > MAX(object ts) fallback."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_live_updates_ray.pipelines import watermark as wmk
from osm_live_updates_ray.pipelines import static_join, update
from osm_live_updates_ray.sources import synthetic
from osm_live_updates_ray.state.store import StateStore

STATES = [
    wmk.ReplicationState(1, "2026-01-01T00:00:00"),
    wmk.ReplicationState(2, "2026-01-01T00:01:00"),
    wmk.ReplicationState(3, "2026-01-01T00:02:00"),
    wmk.ReplicationState(4, "2026-01-01T00:03:00"),
]


class FakeStore:
    def __init__(self, wm=None, latest_ts=None):
        self.watermark = wm
        self._latest_ts = latest_ts

    def latest_object_timestamp(self):
        return self._latest_ts


class TestDecisionTree:
    def test_user_sequence_wins(self):
        st = FakeStore(wm={"seq": 1, "ts": "2026-01-01T00:00:00", "source": "s"})
        assert wmk.decide_start_sequence(STATES, st, requested_seq=3) == 3

    def test_user_timestamp_maps_to_newest_not_after(self):
        # newest state with ts <= given (overlap-by-one semantics)
        assert (
            wmk.decide_start_sequence(
                STATES, FakeStore(), requested_ts="2026-01-01T00:01:30"
            )
            == 2
        )

    def test_stored_watermark_same_source_resumes_plus_one(self):
        st = FakeStore(wm={"seq": 2, "ts": "2026-01-01T00:01:00", "source": "src-a"})
        assert wmk.decide_start_sequence(STATES, st, source="src-a") == 3

    def test_stored_watermark_different_source_uses_timestamp(self):
        # sequence numbers are not comparable across sources — the
        # reference falls back to the stored timestamp
        st = FakeStore(wm={"seq": 99, "ts": "2026-01-01T00:01:00", "source": "src-b"})
        assert wmk.decide_start_sequence(STATES, st, source="src-a") == 2

    def test_fallback_max_object_timestamp(self):
        st = FakeStore(wm=None, latest_ts="2026-01-01T00:02:30")
        assert wmk.decide_start_sequence(STATES, st) == 3

    def test_up_to_date_early_exit(self):
        st = FakeStore(wm={"seq": 4, "ts": "2026-01-01T00:03:00", "source": "s"})
        with pytest.raises(wmk.DatabaseUpToDate):
            wmk.decide_start_sequence(STATES, st, source="s")

    def test_timestamp_at_or_past_latest_is_up_to_date(self):
        with pytest.raises(wmk.DatabaseUpToDate):
            wmk.decide_start_sequence(
                STATES, FakeStore(), requested_ts="2026-01-01T00:03:00"
            )

    def test_empty_store_no_watermark_errors(self):
        with pytest.raises(wmk.ReplicationError):
            wmk.decide_start_sequence(STATES, FakeStore(wm=None, latest_ts=None))


def _write_replication_dir(path, windows):
    os.makedirs(path, exist_ok=True)
    states = []
    for seq, t in windows:
        pq.write_table(t, os.path.join(path, f"{seq:09d}.parquet"))
        import pyarrow.compute as pc

        states.append(
            {"seq": seq,
             "ts": pc.max(t.column("ts")).as_py().strftime("%Y-%m-%dT%H:%M:%S")}
        )
    with open(os.path.join(path, "states.json"), "w") as f:
        json.dump(states, f)


class TestReplicationApply:
    def test_pull_apply_resume_and_up_to_date(
        self, ray_session, t1_world, tmp_path_factory
    ):
        """End-to-end pull-and-apply: two windows applied, watermark
        recorded with the source, re-run exits up-to-date, and the
        result equals applying both windows as one batch."""
        import ray.data as rd

        from osm_live_updates_ray import cli

        w = t1_world
        ch = w["changes"]
        import pyarrow.compute as pc

        w1 = ch.filter(pc.less_equal(ch.column("seq"), 1))
        w2 = ch.filter(pc.greater(ch.column("seq"), 1))
        # window files carry their OWN seq — renumber to 1 and 2
        rep = str(tmp_path_factory.mktemp("repdir"))
        _write_replication_dir(rep, [(1, w1), (2, w2)])

        rootA = str(tmp_path_factory.mktemp("repA"))
        static_join.build_state(
            rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        rc = cli.main(["apply", "--state", rootA, "--replication", rep,
                       "--sequence-number", "1"])
        assert rc == 0
        A = StateStore(rootA)
        assert A.watermark["seq"] == 2
        assert A.watermark["source"] == os.path.abspath(rep)
        # immediate re-run: up-to-date no-op (start = wm.seq+1 = 3 > 2)
        rc = cli.main(["apply", "--state", rootA, "--replication", rep])
        assert rc == 0
        gen = json.load(open(os.path.join(rootA, "manifest.json")))["generation"]
        rc = cli.main(["apply", "--state", rootA, "--replication", rep])
        assert rc == 0
        assert (
            json.load(open(os.path.join(rootA, "manifest.json")))["generation"]
            == gen
        )

        # equality with the one-batch apply
        rootB = str(tmp_path_factory.mktemp("repB"))
        B = static_join.build_state(
            rootB, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        update.apply_changes(B, ch)
        a = A.read_tiles("assignments").sort_by("url")
        b = B.read_tiles("assignments").sort_by("url")
        assert a.equals(b.cast(a.schema))

    def test_latest_object_timestamp_from_stats(self, ray_session, t1_world, tmp_path_factory):
        import ray.data as rd

        w = t1_world
        root = str(tmp_path_factory.mktemp("lots"))
        st = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        got = st.latest_object_timestamp()
        import pyarrow.compute as pc

        want = max(
            pc.max(w[k].column("ts")).as_py()
            for k in ("osm_nodes", "osm_ways", "osm_relations")
        ).strftime("%Y-%m-%dT%H:%M:%S")
        assert got == want


def test_store_older_than_all_windows_clamps_to_oldest():
    # a STORE whose MAX object ts predates every available window must
    # start from the OLDEST window (best-effort catch-up) — but only
    # via the store-fallback paths (clamp_oldest=True); an explicitly
    # USER-requested timestamp that old still errors (likely a typo)
    import pytest

    from osm_live_updates_ray.pipelines import watermark as wmk

    states = [wmk.ReplicationState(5, "2024-06-01T00:00:00"),
              wmk.ReplicationState(6, "2024-06-02T00:00:00")]
    latest = max(states, key=lambda s: s.seq)
    # the clamp is never silent: it warns (ReplicationGapWarning) and
    # records the gap span into gap_notes for the apply summary —
    # the reference THROWS here (OsmReplicationServerHelper.cpp:168-170)
    notes: list = []
    with pytest.warns(wmk.ReplicationGapWarning, match="replication gap"):
        st = wmk.state_for_timestamp(
            states, latest, "2023-01-01T00:00:00", clamp_oldest=True,
            gap_notes=notes,
        )
    assert st.seq == 5
    assert len(notes) == 1 and "2023-01-01T00:00:00" in notes[0]
    with pytest.raises(wmk.ReplicationError):
        wmk.state_for_timestamp(states, latest, "2023-01-01T00:00:00")
