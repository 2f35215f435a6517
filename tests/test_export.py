"""Resumable sharded export: kill-and-resume semantics."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from osm_live_updates_ray.pipelines.export import export_sharded


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    import numpy as np

    for i in range(6):
        ids = np.arange(i * 100, (i + 1) * 100, dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": ids, "v": ids * 2}),
            d / f"part{i}.parquet",
        )
    return str(d)


def _read_all(out):
    tabs = []
    for sh in sorted(os.listdir(out)):
        sdir = os.path.join(out, sh)
        assert os.path.exists(os.path.join(sdir, "_SUCCESS"))
        tabs.append(pq.read_table(sdir, ignore_prefixes=["_SUCCESS"]))
    return pa.concat_tables(tabs).sort_by("doc_id")


class TestExportSharded:
    def test_full_export_round_trips(self, ray_session, corpus_dir,
                                     tmp_path):
        out = str(tmp_path / "out")
        res = export_sharded(corpus_dir, out, num_shards=4)
        assert res["written"] == [0, 1, 2, 3] and res["skipped"] == []
        got = _read_all(out)
        want = pq.read_table(corpus_dir).sort_by("doc_id")
        assert got.equals(want)

    def test_resume_skips_committed_and_preserves_files(
            self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        export_sharded(corpus_dir, out, num_shards=4)
        # simulate a crash: drop shard 2's marker + files (half-done)
        import shutil

        shutil.rmtree(os.path.join(out, "shard=2"))
        stamps = {}
        for sh in ("shard=0", "shard=1", "shard=3"):
            sdir = os.path.join(out, sh)
            stamps[sh] = {
                f: os.path.getmtime(os.path.join(sdir, f))
                for f in os.listdir(sdir)
            }
        res = export_sharded(corpus_dir, out, num_shards=4)
        assert res["written"] == [2]
        assert res["skipped"] == [0, 1, 3]
        # committed shards' files untouched byte-for-byte (mtime)
        for sh, want in stamps.items():
            sdir = os.path.join(out, sh)
            got = {f: os.path.getmtime(os.path.join(sdir, f))
                   for f in os.listdir(sdir)}
            assert got == want
        assert _read_all(out).equals(
            pq.read_table(corpus_dir).sort_by("doc_id"))

    def test_membership_change_reexports_not_silently_skips(
            self, ray_session, corpus_dir, tmp_path):
        """The advisor's resume-contract hole: committing shards under
        one (file list, num_shards) and resuming under another must NOT
        skip shards with stale membership — rows would silently drop or
        duplicate in the combined output."""
        out = str(tmp_path / "out")
        export_sharded(corpus_dir, out, num_shards=4)
        # the input GROWS between runs: a new file lands
        import numpy as np

        ids = np.arange(600, 700, dtype=np.int64)
        pq.write_table(pa.table({"doc_id": ids, "v": ids * 2}),
                       os.path.join(corpus_dir, "part6.parquet"))
        res = export_sharded(corpus_dir, out, num_shards=4)
        # shard 2 now owns part6 too -> membership mismatch -> re-export
        assert 2 in res["remapped"] and 2 in res["written"]
        assert _read_all(out).equals(
            pq.read_table(corpus_dir).sort_by("doc_id"))

    def test_membership_change_can_error(self, ray_session, corpus_dir,
                                         tmp_path):
        out = str(tmp_path / "out")
        export_sharded(corpus_dir, out, num_shards=4)
        with pytest.raises(RuntimeError, match="membership"):
            # changing num_shards remaps EVERY file; strict mode refuses
            export_sharded(corpus_dir, out, num_shards=5,
                           on_membership_change="error")

    def test_transform_and_projection(self, ray_session, corpus_dir,
                                      tmp_path):
        out = str(tmp_path / "out")

        def double(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id",
                pc.multiply(t.column("doc_id"), pa.scalar(1)))

        export_sharded(corpus_dir, out, num_shards=3,
                       transform=double, columns=["doc_id"])
        got = _read_all(out)
        assert got.column_names == ["doc_id"]
        assert got.num_rows == 600
