"""Kill-and-resume: a driver SIGKILLed mid-apply must leave the store
readable at the previous generation, and a rerun must produce exactly
the state a never-killed run produces (north_rule: killed driver
resumes mid-shuffle; manifest commit + startup GC are the mechanism)."""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest


def _state_fingerprint(root: str) -> dict:
    sys.path.insert(0, "/root/repo")
    from osm_live_updates_ray.state.store import StateStore

    st = StateStore(root)
    out = {"generation": st._manifest["generation"]}
    for t in ("nodes", "ways", "relations", "geoms", "polygon_rings"):
        tbl = st.read_all(t)
        out[t] = (tbl.num_rows, hash(str(tbl.sort_by(
            [(tbl.column_names[0], "ascending")]).to_pydict())))
    a = st.read_tiles("assignments").sort_by("url")
    out["assignments"] = (a.num_rows, hash(str(a.to_pydict())))
    return out


APPLY_SCRIPT = textwrap.dedent(
    """
    import sys, os
    sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq
    from osm_live_updates_ray.pipelines import update
    from osm_live_updates_ray.state.store import StateStore
    root, chpath, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    import dataclasses
    from osm_live_updates_ray.config import DEFAULT_CONFIG
    cfg = (dataclasses.replace(DEFAULT_CONFIG, cow_task_tiles=0,
                               rejoin_driver_rows=0)
           if mode == "dist" else DEFAULT_CONFIG)
    store = StateStore(root, cfg)
    print("READY", flush=True)
    update.apply_changes(store, pq.read_table(chpath), cfg)
    print("DONE", flush=True)
    ray.shutdown()
    """
)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["driver", "dist"])
def test_sigkill_mid_apply_then_resume(ray_session, t1_world, tmp_path_factory, mode):
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm_live_updates_ray.pipelines import static_join

    w = t1_world
    base = tmp_path_factory.mktemp("resume")
    rootA = str(base / "killed")
    rootB = str(base / "clean")
    for root in (rootA, rootB):
        static_join.build_state(
            root, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"]
        )
    chpath = str(base / "changes.parquet")
    pq.write_table(w["changes"], chpath)

    before = _state_fingerprint(rootA)

    # run an apply in a fresh process that dies at the WORST moment:
    # all partition/tile files written, manifest not swapped
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the subprocess owns its own session
    env["OLU_CRASH_BEFORE_COMMIT"] = "1"
    p = subprocess.Popen(
        [sys.executable, "-u", "-c", APPLY_SCRIPT, rootA, chpath, mode],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        cwd="/root/repo",
    )
    assert p.stdout.readline().strip() == "READY"
    p.wait()
    assert p.returncode == 137  # died pre-commit by construction

    # the killed store must still open at the COMMITTED generation with
    # identical contents (manifest swap is the only commit point)
    after_kill = _state_fingerprint(rootA)
    assert after_kill == before

    # resume: re-apply the same window on the survivor; a clean store
    # gets the same window once; both must end identical
    from osm_live_updates_ray.pipelines import update
    from osm_live_updates_ray.state.store import StateStore

    update.apply_changes(StateStore(rootA), w["changes"])
    update.apply_changes(StateStore(rootB), w["changes"])
    fa = _state_fingerprint(rootA)
    fb = _state_fingerprint(rootB)
    fa.pop("generation"), fb.pop("generation")
    assert fa == fb


def test_bootstrap_crash_then_resume(ray_session, t1_world, tmp_path_factory,
                                     monkeypatch):
    """A bootstrap that dies AFTER the geometry-phase commit must be
    resumable: ``build_state(resume=True)`` skips the committed phases
    (the polygon_rings files are left untouched, not rebuilt) and the
    finished store equals a clean single-shot build byte-for-byte."""
    import glob

    import ray.data as rd

    from osm_live_updates_ray.pipelines import static_join
    from osm_live_updates_ray.stages import spatial

    w = t1_world
    rootA = str(tmp_path_factory.mktemp("bootA"))
    rootB = str(tmp_path_factory.mktemp("bootB"))

    # crash injection: the first phase AFTER the rings/geoms commit is
    # the pages geocode — make it explode once
    real_geocode = spatial.geocode

    def boom(*a, **k):
        raise RuntimeError("injected crash after geometry commit")

    monkeypatch.setattr(static_join.spatial, "geocode", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        static_join.build_state(
            rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"],
        )
    monkeypatch.setattr(static_join.spatial, "geocode", real_geocode)

    ring_files_after_crash = sorted(glob.glob(os.path.join(rootA, "polygon_rings", "*")))
    assert ring_files_after_crash  # geometry phase WAS committed

    # resume finishes only the missing phases
    static_join.build_state(
        rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"], resume=True,
    )
    assert sorted(glob.glob(os.path.join(rootA, "polygon_rings", "*"))) == \
        ring_files_after_crash  # phase skipped, not rebuilt

    static_join.build_state(
        rootB, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"],
    )
    fa, fb = _state_fingerprint(rootA), _state_fingerprint(rootB)
    fa.pop("generation"), fb.pop("generation")
    assert fa == fb


def test_bootstrap_crash_mid_tile_write_then_resume(
    ray_session, t1_world, tmp_path_factory, monkeypatch
):
    """A bootstrap that dies DURING a tile-table write (some
    ``tile_id=N/`` shards on disk, manifest entry absent, possibly a
    truncated compaction ``.tmp``) must resume clean: the orphan shards
    are discarded, not merged into the rebuilt table (no duplicate
    rows), and the finished store equals a clean single-shot build."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm_live_updates_ray.pipelines import static_join
    from osm_live_updates_ray.stages import spatial
    from osm_live_updates_ray.state.store import StateStore

    w = t1_world
    rootA = str(tmp_path_factory.mktemp("bootMidA"))
    rootB = str(tmp_path_factory.mktemp("bootMidB"))

    real_geocode = spatial.geocode
    monkeypatch.setattr(
        static_join.spatial, "geocode",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        static_join.build_state(
            rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"],
        )
    monkeypatch.setattr(static_join.spatial, "geocode", real_geocode)

    # simulate the mid-write crash the phase-boundary test can't reach:
    # partial hive shards + a truncated compaction tmp, no manifest entry
    stale_dir = os.path.join(rootA, "pages", "tile_id=424242")
    os.makedirs(stale_dir)
    pq.write_table(
        pa.table({"url": ["stale://dup"], "cell_id": [0]}),
        os.path.join(stale_dir, "zz_orphan_shard.parquet"),
    )
    with open(os.path.join(stale_dir, ".data.parquet.tmp"), "wb") as fh:
        fh.write(b"PAR1\x00truncated")

    static_join.build_state(
        rootA, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"], resume=True,
    )
    static_join.build_state(
        rootB, rd.from_arrow(w["pages"]), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"],
    )

    # the orphan tile is gone from disk and from the manifest
    assert not glob.glob(os.path.join(rootA, "pages", "tile_id=424242*"))
    assert "424242" not in StateStore(rootA)._manifest["tables"]["tile:pages"]

    # byte-level: the rebuilt pages table has no duplicated/stale rows
    pa_pages = StateStore(rootA).read_tiles("pages").sort_by("url")
    pb_pages = StateStore(rootB).read_tiles("pages").sort_by("url")
    assert pa_pages.equals(pb_pages)

    fa, fb = _state_fingerprint(rootA), _state_fingerprint(rootB)
    fa.pop("generation"), fb.pop("generation")
    assert fa == fb


def test_sharded_bootstrap_mid_phase_resume(
    ray_session, t1_world, tmp_path_factory, monkeypatch
):
    """``pages_shards``: a sharded bootstrap killed MID-PHASE (two of
    four pages shards sealed) must, on resume, re-execute ONLY the
    unsealed shards — sealed shard output is reused, the stage dir is
    cleaned up after the final commit, and the finished store equals a
    clean plain (unsharded) build."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from osm_live_updates_ray.pipelines import static_join
    from osm_live_updates_ray.stages import spatial
    from osm_live_updates_ray.state.store import StateStore

    w = t1_world
    pdir = tmp_path_factory.mktemp("pshards")
    n = w["pages"].num_rows
    step = -(-n // 4)
    shards = []
    for i in range(4):
        f = str(pdir / f"pages-{i:02d}.parquet")
        pq.write_table(w["pages"].slice(i * step, step), f)
        shards.append([f])
    all_files = [f for g in shards for f in g]
    rootA = str(tmp_path_factory.mktemp("shardA"))
    rootB = str(tmp_path_factory.mktemp("shardB"))

    real_geocode = spatial.geocode
    calls = {"n": 0}

    def flaky(ds, cfg):
        calls["n"] += 1
        if calls["n"] == 3:  # dies while processing shard 2 of 0..3
            raise RuntimeError("injected shard crash")
        return real_geocode(ds, cfg)

    monkeypatch.setattr(static_join.spatial, "geocode", flaky)
    with pytest.raises(RuntimeError, match="injected shard"):
        static_join.build_state(
            rootA, rd.read_parquet(all_files), w["osm_nodes"], w["osm_ways"],
            w["osm_relations"], pages_shards=shards,
        )

    stage = os.path.join(rootA, "pages.stage")
    sealed = sorted(glob.glob(os.path.join(stage, "shard=*", "_DONE")))
    assert len(sealed) == 2  # shards 0 and 1 sealed before the crash

    counted = {"n": 0}

    def counting(ds, cfg):
        counted["n"] += 1
        return real_geocode(ds, cfg)

    monkeypatch.setattr(static_join.spatial, "geocode", counting)
    static_join.build_state(
        rootA, rd.read_parquet(all_files), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"], resume=True, pages_shards=shards,
    )
    # only the two UNSEALED shards were re-executed
    assert counted["n"] == 2
    # the stage dir is gone once the table is committed
    assert not os.path.exists(stage)
    assert not os.path.exists(os.path.join(rootA, "assignments.stage"))

    monkeypatch.setattr(static_join.spatial, "geocode", real_geocode)
    static_join.build_state(
        rootB, rd.read_parquet(all_files), w["osm_nodes"], w["osm_ways"],
        w["osm_relations"],
    )
    pa_pages = StateStore(rootA).read_tiles("pages").sort_by("url")
    pb_pages = StateStore(rootB).read_tiles("pages").sort_by("url")
    assert pa_pages.equals(pb_pages)
    fa, fb = _state_fingerprint(rootA), _state_fingerprint(rootB)
    fa.pop("generation"), fb.pop("generation")
    assert fa == fb
