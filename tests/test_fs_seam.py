"""Filesystem seam (state/fsio.py): the SAME bootstrap -> apply ->
resume flow must run against a SubTreeFileSystem rooted elsewhere (the
proxy for shared/remote storage — every path the store touches goes
through the pyarrow FileSystem, none through the OS), and the store
source must contain no direct ``open()`` / ``os.rename`` /
``shutil`` on table data paths.

Reference parity framing: the reference keeps ALL state behind a
network interface (include/osm/OsmDataFetcher.h:49-174) — the
filesystem seam is this engine's analog.
"""

import json
import os
import time

import numpy as np
import pyarrow as pa
import pytest
from pyarrow import fs as pafs

from osm_live_updates_ray.pipelines import static_join, update
from osm_live_updates_ray.sources import synthetic
from osm_live_updates_ray.state.store import StateStore


@pytest.fixture(scope="module")
def subtree_world(ray_session, tmp_path_factory):
    """World + a store bootstrapped THROUGH a SubTreeFileSystem whose
    root is elsewhere: store paths are subtree-relative, so any direct
    OS access of them would fail loudly."""
    import ray.data as rd

    w = synthetic.gen_world("t1")
    host_root = str(tmp_path_factory.mktemp("subtree_host"))
    fs = pafs.SubTreeFileSystem(host_root, pafs.LocalFileSystem())
    # NOTE "state" is relative to the subtree — not a real OS path from
    # the test's cwd
    store = static_join.build_state(
        "state", rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"], filesystem=fs,
    )
    return w, host_root, fs, store


class TestSubTreeFileSystem:
    def test_bootstrap_layout_lands_under_subtree(self, subtree_world):
        w, host_root, fs, store = subtree_world
        # the physical tree exists under the HOST root only
        assert os.path.exists(os.path.join(host_root, "state",
                                           "manifest.json"))
        assert not os.path.exists("state")
        assert store.count("nodes") == w["osm_nodes"].num_rows

    def test_lookup_and_tiles_read_through_fs(self, subtree_world):
        w, host_root, fs, store = subtree_world
        ids = w["osm_nodes"].column("id").to_numpy(
            zero_copy_only=False)[:5].astype(np.int64)
        t = store.node_locations(ids)
        assert t.num_rows == len(ids)
        a = store.read_tiles("assignments")
        assert a.num_rows == w["pages"].num_rows

    def test_apply_and_resume_through_fs(self, subtree_world,
                                         tmp_path_factory):
        """A change window applies, commits, and a RE-OPEN from the
        same filesystem sees the committed generation (kill-and-resume
        through the seam)."""
        w, host_root, fs, store = subtree_world
        update.apply_changes(store, w["changes"])
        assert store._manifest["generation"] >= 1
        reopened = StateStore("state", filesystem=fs)
        assert (reopened._manifest["generation"]
                == store._manifest["generation"])
        assert reopened.count("nodes") == store.count("nodes")
        # conformance anchor: the reopened store equals a local-FS
        # replay of the same world + window
        import ray.data as rd

        local_root = str(tmp_path_factory.mktemp("localref"))
        local = static_join.build_state(
            local_root, rd.from_arrow(w["pages"]), w["osm_nodes"],
            w["osm_ways"], w["osm_relations"],
        )
        update.apply_changes(local, w["changes"])
        for name in ("nodes", "ways", "relations"):
            ta = reopened.read_all(name).sort_by("id")
            tb = local.read_all(name).sort_by("id")
            assert ta.equals(tb.cast(ta.schema))
        ta = reopened.read_tiles("assignments").sort_by("url")
        tb = local.read_tiles("assignments").sort_by("url")
        assert ta.equals(tb.cast(ta.schema))


class TestWriterLockCrossHost:
    def test_foreign_host_lock_honored_within_ttl(self, tmp_path):
        root = str(tmp_path / "s")
        store = StateStore.build(root)
        # plant a fresh lock from another host: unprobeable -> live
        store.io.write_text_atomic(
            store._lock_path(),
            json.dumps({"host": "other-host", "pid": 1, "ts": time.time()}),
        )
        assert store._live_foreign_writer()
        with pytest.raises(RuntimeError, match="writer lock"):
            store.begin()

    def test_foreign_host_lock_expires_after_ttl(self, tmp_path):
        from osm_live_updates_ray.state import fsio

        root = str(tmp_path / "s")
        store = StateStore.build(root)
        store.io.write_text_atomic(
            store._lock_path(),
            json.dumps({"host": "other-host", "pid": 1,
                        "ts": time.time() - fsio.LOCK_TTL_SEC - 10}),
        )
        assert not store._live_foreign_writer()
        store.begin()  # stale remote lock is overridden
        store.commit()

    def test_legacy_bare_pid_lock_still_parses(self, tmp_path):
        root = str(tmp_path / "s")
        store = StateStore.build(root)
        store.io.write_text_atomic(store._lock_path(), str(os.getpid()))
        # own pid -> not foreign
        assert not store._live_foreign_writer()


class TestNoDirectOsIO:
    def test_store_source_has_no_direct_fs_calls(self):
        """Greppable invariant: every byte the store moves goes through
        StoreFS.  Allowed direct os usage: pid probing for the
        same-host writer lock (os.getpid / os.kill) only."""
        import osm_live_updates_ray.state.store as store_mod

        src = open(store_mod.__file__).read()
        for needle in ("open(", "os.rename", "os.replace", "os.remove",
                       "os.makedirs", "os.listdir", "shutil.",
                       "os.path.join", "os.path.exists", "os.path.isdir"):
            # strip comments/docstrings conservatively: scan code lines
            hits = [
                ln for ln in src.splitlines()
                if needle in ln and not ln.strip().startswith(("#", '"', "'"))
                and "io.open" not in ln
            ]
            assert not hits, f"direct {needle} in store.py: {hits}"

    def test_fsio_is_picklable_for_worker_shipping(self):
        import pickle

        from osm_live_updates_ray.state.fsio import StoreFS

        io = StoreFS(pafs.SubTreeFileSystem("/tmp", pafs.LocalFileSystem()))
        io2 = pickle.loads(pickle.dumps(io))
        assert isinstance(io2.fs, pafs.SubTreeFileSystem)
        assert not io2.is_local


class TestShardedBootstrapOnSubtree:
    def test_sharded_build_through_fs_equals_plain(
            self, ray_session, tmp_path_factory):
        """The mid-phase-resumable sharded bootstrap (staging dirs,
        _DONE seals, worker-side compaction) is the most multi-node-
        critical path: run it entirely through a SubTreeFileSystem and
        pin equality with a plain local build.  Note the PAGES INPUT
        stays on local disk (a corpus read is not store state); only
        the store tree goes through the seam."""
        import pyarrow.parquet as pq
        import ray.data as rd

        w = synthetic.gen_world("t1")
        pdir = tmp_path_factory.mktemp("fs_pshards")
        n = w["pages"].num_rows
        step = -(-n // 3)
        shards = []
        for i in range(3):
            f = str(pdir / f"pages-{i:02d}.parquet")
            pq.write_table(w["pages"].slice(i * step, step), f)
            shards.append([f])
        all_files = [f for g in shards for f in g]

        host_root = str(tmp_path_factory.mktemp("fs_shard_host"))
        fs = pafs.SubTreeFileSystem(host_root, pafs.LocalFileSystem())
        sub = static_join.build_state(
            "st", rd.read_parquet(all_files), w["osm_nodes"],
            w["osm_ways"], w["osm_relations"], pages_shards=shards,
            filesystem=fs,
        )
        # stage dirs cleaned up after the final commit
        assert not os.path.exists(os.path.join(host_root, "st",
                                               "pages.stage"))
        local_root = str(tmp_path_factory.mktemp("fs_shard_local"))
        plain = static_join.build_state(
            local_root, rd.read_parquet(all_files), w["osm_nodes"],
            w["osm_ways"], w["osm_relations"],
        )
        for name in ("assignments", "pages"):
            a = sub.read_tiles(name).sort_by("url")
            b = plain.read_tiles(name).sort_by("url")
            assert a.equals(b.cast(a.schema))
