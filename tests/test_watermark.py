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


class TestReplicationUrl:
    """Pure-string URL/path arithmetic vs the reference's own unit tests
    (reference tests/util/URLHelper.cpp golden strings)."""

    def test_format_sequence_golden(self):
        from osm_live_updates_ray.sources import replication_url as ru

        assert ru.format_sequence_for_url(6177383) == "006/177/383"
        assert ru.format_sequence_for_url(116177383) == "116/177/383"
        assert ru.format_sequence_for_url(0) == "000/000/000"
        assert ru.format_sequence_for_url(999999999) == "999/999/999"
        import pytest as _pt

        with _pt.raises(ValueError):
            ru.format_sequence_for_url(1234567890)
        with _pt.raises(ValueError):
            ru.format_sequence_for_url(-1)

    def test_parse_sequence_inverse(self):
        from osm_live_updates_ray.sources import replication_url as ru

        for s in (0, 7, 6177383, 116177383, 999999999):
            assert ru.parse_sequence_from_path(ru.change_file_path(s)) == s
            assert ru.parse_sequence_from_path(ru.state_path(s)) == s

    def test_build_url_golden(self):
        from osm_live_updates_ray.sources import replication_url as ru

        assert ru.build_url(
            ["https://www.openstreetmap.org/api/0.6/node", "state.txt"]
        ) == "https://www.openstreetmap.org/api/0.6/node/state.txt"
        assert ru.build_url([]) == ""

    def test_encode_for_url_query_golden(self):
        from osm_live_updates_ray.sources import replication_url as ru

        assert ru.encode_for_url_query(
            "https://www.openstreetmap.org/api/0.6/node/123456789"
        ) == "https%3A%2F%2Fwww.openstreetmap.org%2Fapi%2F0.6%2Fnode%2F123456789"
        assert ru.encode_for_url_query("Hello World!") == "Hello%20World%21"
        assert ru.encode_for_url_query(
            "Special characters: & ? = #"
        ) == "Special%20characters%3A%20%26%20%3F%20%3D%20%23"

    def test_is_valid_uri(self):
        from osm_live_updates_ray.sources import replication_url as ru

        assert ru.is_valid_uri("https://planet.osm.org/replication/minute/")
        assert not ru.is_valid_uri("not a uri")

    def test_state_and_change_paths(self):
        from osm_live_updates_ray.sources import replication_url as ru

        assert ru.state_path() == "state.txt"
        assert ru.state_path(4290) == "000/004/290.state.txt"
        assert ru.change_file_path(4290) == "000/004/290.osc.gz"

    def test_parse_state_file_roundtrip(self):
        from osm_live_updates_ray.sources import replication_url as ru

        body = ru.render_state_file(4290, "2025-01-04T21:21:15")
        st = ru.parse_state_file(body)
        assert st.sequence_number == 4290
        assert st.ts_raw == "2025-01-04T21\\:21\\:15Z"
        assert st.ts == "2025-01-04T21:21:15"
        import pytest as _pt

        with _pt.raises(ValueError):
            ru.parse_state_file("timestamp=2025-01-04T21\\:21\\:15Z")
        with _pt.raises(ValueError):
            ru.parse_state_file("sequenceNumber=7")

    def test_educated_guess(self):
        from osm_live_updates_ray.sources import replication_url as ru

        now = "2025-01-04T22:21:15"
        ts = "2025-01-04T21:21:15"
        assert ru.educated_guess_sequence(
            ts, 1000, "https://planet.osm.org/replication/minute/", now
        ) == 940
        assert ru.educated_guess_sequence(
            ts, 1000, "https://planet.osm.org/replication/hour/", now
        ) == 999
        assert ru.educated_guess_sequence(
            ts, 1000, "https://planet.osm.org/replication/day/", now
        ) == 1000
        assert ru.educated_guess_sequence(
            ts, 1000, "https://example.org/replication/minute/", now
        ) == -1


def _write_seq_tree(path, windows):
    """Write the reference's XXX/XXX/XXX replication-server layout
    locally: root state.txt + per-seq .state.txt and .osc.gz files."""
    from osm_live_updates_ray.sources import replication_url as ru

    os.makedirs(path, exist_ok=True)
    latest = None
    for seq, t, ts in windows:
        frag = ru.format_sequence_for_url(seq)
        os.makedirs(os.path.join(path, os.path.dirname(frag)), exist_ok=True)
        with open(os.path.join(path, frag + ".state.txt"), "w") as f:
            f.write(ru.render_state_file(seq, ts))
        pq.write_table(t, os.path.join(path, frag + ".parquet"))
        latest = (seq, ts)
    with open(os.path.join(path, "state.txt"), "w") as f:
        f.write(ru.render_state_file(*latest))


class TestSeqTreeSource:
    def test_seq_tree_end_to_end(self, ray_session, t1_world, tmp_path_factory):
        """The reference's XXX/XXX/XXX tree layout drives the same
        pull-and-apply path as the flat dir — same final state."""
        import pyarrow.compute as pc
        import ray.data as rd

        from osm_live_updates_ray import cli
        from osm_live_updates_ray.pipelines import watermark as wmk

        w = t1_world
        ch = w["changes"]
        w1 = ch.filter(pc.less_equal(ch.column("seq"), 1))
        w2 = ch.filter(pc.greater(ch.column("seq"), 1))
        rep = str(tmp_path_factory.mktemp("seqtree"))
        _write_seq_tree(
            rep,
            [(6177382, w1, "2024-06-01T00:00:00"),
             (6177383, w2, "2024-06-02T00:00:00")],
        )
        src = wmk.open_replication_source(rep)
        assert isinstance(src, wmk.SeqTreeReplicationSource)
        sts = src.states()
        assert [s.seq for s in sts] == [6177382, 6177383]
        assert src.latest_state().seq == 6177383

        rootA = str(tmp_path_factory.mktemp("seqA"))
        static_join.build_state(
            rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        rc = cli.main(["apply", "--state", rootA, "--replication", rep,
                       "--sequence-number", "6177382"])
        assert rc == 0
        A = StateStore(rootA)
        assert A.watermark["seq"] == 6177383
        # re-run: up-to-date no-op
        rc = cli.main(["apply", "--state", rootA, "--replication", rep])
        assert rc == 0

        # equality with the one-batch apply
        rootB = str(tmp_path_factory.mktemp("seqB"))
        B = static_join.build_state(
            rootB, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
        update.apply_changes(B, ch)
        a = A.read_tiles("assignments").sort_by("url")
        b = B.read_tiles("assignments").sort_by("url")
        assert a.equals(b.cast(a.schema))

    def test_seq_tree_osc_gz_window(self, tmp_path):
        """A seq-tree whose change file is a real .osc.gz loads through
        the gz branch of the per-seq file lookup."""
        import gzip

        from osm_live_updates_ray.pipelines import watermark as wmk
        from osm_live_updates_ray.sources import replication_url as ru

        seq = 4290
        frag = ru.format_sequence_for_url(seq)
        os.makedirs(os.path.join(tmp_path, os.path.dirname(frag)))
        xml = (
            b'<osmChange version="0.6"><create>'
            b'<node id="7" version="1" timestamp="2024-06-01T00:00:00Z" '
            b'lat="1.5" lon="2.5"/></create></osmChange>'
        )
        with gzip.open(os.path.join(tmp_path, frag + ".osc.gz"), "wb") as f:
            f.write(xml)
        with open(os.path.join(tmp_path, frag + ".state.txt"), "w") as f:
            f.write(ru.render_state_file(seq, "2024-06-01T00:00:00"))
        with open(os.path.join(tmp_path, "state.txt"), "w") as f:
            f.write(ru.render_state_file(seq, "2024-06-01T00:00:00"))
        src = wmk.open_replication_source(str(tmp_path))
        t = src.load(seq)
        assert t.num_rows == 1
        assert t.column("id")[0].as_py() == 7
        assert t.column("seq")[0].as_py() == seq


class TestHttpReplicationSource:
    """Live-transport adapter (reference
    OsmReplicationServerHelper.cpp:40-107) with a MOCKED url->bytes
    transport — no network anywhere; the layout/path arithmetic is the
    golden-string-tested seq-tree."""

    BASE = "https://mock.example/replication/minute"

    @staticmethod
    def _osc(nodes):
        body = "".join(
            f'<node id="{i}" version="2" timestamp="{ts}Z" '
            f'lon="{lon}" lat="{lat}"/>'
            for i, lon, lat, ts in nodes
        )
        return (
            '<?xml version="1.0"?><osmChange version="0.6">'
            f"<modify>{body}</modify></osmChange>"
        ).encode()

    def _server(self):
        """Fake tree: sequences 42..44, state.txt at 44."""
        import gzip as _gz

        from osm_live_updates_ray.sources import replication_url as ru

        urls = {}
        for seq, ts in ((42, "2024-06-01T00:00:00"),
                        (43, "2024-06-01T00:01:00"),
                        (44, "2024-06-01T00:02:00")):
            frag = ru.format_sequence_for_url(seq)
            urls[f"{self.BASE}/{frag}.state.txt"] = ru.render_state_file(
                seq, ts).encode()
            urls[f"{self.BASE}/{frag}.osc.gz"] = _gz.compress(
                self._osc([(seq * 10, 1.5, 2.5, ts)]))
        urls[f"{self.BASE}/state.txt"] = ru.render_state_file(
            44, "2024-06-01T00:02:00").encode()
        return urls

    def _transport(self, urls, log=None):
        from osm_live_updates_ray.pipelines.watermark import ReplicationError

        def get(url):
            if log is not None:
                log.append(url)
            if url not in urls:
                raise ReplicationError(f"GET {url} -> HTTP 404")
            return urls[url]

        return get

    def test_states_walk_and_lazy_load(self):
        from osm_live_updates_ray.pipelines import watermark as wmk

        log = []
        src = wmk.open_replication_source(
            self.BASE, transport=self._transport(self._server(), log))
        assert isinstance(src, wmk.HttpReplicationSource)
        assert [s.seq for s in src.states()] == [42, 43, 44]
        assert src.latest_state().seq == 44
        # constructor fetched ONLY state files — change bytes are lazy
        assert not any(u.endswith(".osc.gz") for u in log)
        t = src.load(43)
        assert t.num_rows == 1
        assert t.column("id").to_pylist() == [430]
        assert t.column("seq").to_pylist() == [43]
        w = src.window(43)
        assert sorted(w.column("id").to_pylist()) == [430, 440]

    def test_history_horizon_stops_walk(self):
        from osm_live_updates_ray.pipelines import watermark as wmk

        urls = self._server()
        # server pruned sequence 42's state: the walk must stop there,
        # not error
        from osm_live_updates_ray.sources import replication_url as ru

        del urls[f"{self.BASE}/{ru.format_sequence_for_url(42)}.state.txt"]
        src = wmk.HttpReplicationSource(
            self.BASE, transport=self._transport(urls))
        assert [s.seq for s in src.states()] == [43, 44]

    def test_transport_failure_aborts_window_keeps_watermark(
            self, ray_session, t1_world, tmp_path_factory):
        """Reference behavior on fetch errors: abort the window, keep
        the watermark (cpr throws, OsmUpdater leaves state untouched)."""
        import ray.data as rd

        from osm_live_updates_ray.pipelines import watermark as wmk

        urls = self._server()
        # change file 44 vanishes AFTER the state walk (mid-pull fault)
        from osm_live_updates_ray.sources import replication_url as ru

        src = wmk.HttpReplicationSource(
            self.BASE, transport=self._transport(urls))
        del urls[f"{self.BASE}/{ru.format_sequence_for_url(44)}.osc.gz"]

        w = t1_world
        root = str(tmp_path_factory.mktemp("httprep"))
        store = static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"])
        store.set_watermark(43, "2024-06-01T00:01:00", source=src.uri)
        store.begin()
        store.commit()
        gen = store._manifest["generation"]
        with pytest.raises(wmk.ReplicationError, match="404"):
            src.window(44)
        # nothing applied, watermark untouched
        reopened = StateStore(root)
        assert reopened.watermark["seq"] == 43
        assert reopened._manifest["generation"] == gen

    def test_default_transport_error_shape(self):
        """The stdlib transport wraps any failure in ReplicationError
        (never a raw urllib exception) — exercised against an
        unresolvable scheme, no network touched."""
        from osm_live_updates_ray.pipelines import watermark as wmk

        with pytest.raises(wmk.ReplicationError):
            wmk._default_transport("http://127.0.0.1:1/state.txt",
                                   timeout=0.2)
