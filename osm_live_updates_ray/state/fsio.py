"""Filesystem seam for the state store.

The reference keeps ALL state behind a network interface
(``include/osm/OsmDataFetcher.h:49-174`` — the endpoint is the store);
our analog is a ``pyarrow.fs.FileSystem`` seam: every byte the
:class:`~osm_live_updates_ray.state.store.StateStore` reads or writes
— table partitions, tile dirs, manifest, lineage, locks, staging —
goes through one of these helpers, so the SAME store runs on local
disk (default, zero behavior change), on a subtree of it (tests), or
on shared storage (S3/GCS/HDFS via the matching pyarrow filesystem)
for the multi-node deployment where actors on different hosts must
see one state tree.

pyarrow FileSystems PICKLE, so worker-side readers (sharded-join
actors, COW tile tasks) receive the filesystem with their file lists
and read through it — bare local paths are just the special case.

Commit protocol by filesystem class:

* **Atomic-rename stores** (local FS, HDFS): ``replace()`` maps to
  ``move`` which is an atomic rename — the manifest swap is the commit
  point exactly as before.
* **Object stores without atomic rename** (S3-style): ``move`` is
  copy+delete, so the manifest swap is NOT atomic by itself.  The
  store is SINGLE-WRITER by contract (the writer lock below); under a
  single writer, copy+delete of ``manifest.json`` is still safe
  against every failure the engine handles (a crash between copy and
  delete leaves a stale tmp, GC'd at next open; readers opening
  mid-copy see either the old or the new manifest because the copy is
  a single PUT on stores with atomic whole-object PUT — the S3
  semantics).  What a non-atomic store does NOT support is multiple
  concurrent writers; that requires an external lock service and is
  out of scope (documented, like the reference's single updater
  process per endpoint).

The writer lock generalizes the pid file: the lock records
``{host, pid, ts}``.  On the SAME host a foreign pid is probed with
``kill -0`` (exact liveness, as before).  A lock from ANOTHER host
cannot be probed, so it is honored until ``LOCK_TTL_SEC`` passes —
a crashed remote writer's lock expires rather than wedging the store
forever, while a live one is never raced within the TTL (its commits
refresh the lock).
"""

from __future__ import annotations

import json
import posixpath
import uuid

from pyarrow import fs as pafs

#: a writer lock from another HOST (unprobeable) is considered stale
#: after this long without refresh; same-host locks use exact pid
#: liveness instead.
LOCK_TTL_SEC = 24 * 3600


class StoreFS:
    """The store's file operations over one ``pyarrow.fs.FileSystem``.

    Thin by design: each helper is the one canonical spelling of an
    operation the store needs, so "no direct ``open()``/``os.*`` on
    table data paths" is a greppable invariant (pytest enforces it).
    """

    def __init__(self, filesystem: pafs.FileSystem | None = None):
        self.fs = filesystem or pafs.LocalFileSystem()
        self.is_local = isinstance(self.fs, pafs.LocalFileSystem)

    # -- paths ---------------------------------------------------------
    @staticmethod
    def join(*parts: str) -> str:
        return posixpath.join(*parts)

    # -- dir/file queries ---------------------------------------------
    def _info(self, path: str) -> pafs.FileInfo:
        return self.fs.get_file_info(path)

    def exists(self, path: str) -> bool:
        return self._info(path).type != pafs.FileType.NotFound

    def isdir(self, path: str) -> bool:
        return self._info(path).type == pafs.FileType.Directory

    def listdir(self, path: str) -> list[str]:
        """Base names of the DIRECT children of ``path`` (sorted);
        empty when the dir is missing."""
        sel = pafs.FileSelector(path, recursive=False,
                                allow_not_found=True)
        return sorted(
            posixpath.basename(i.path.rstrip("/"))
            for i in self.fs.get_file_info(sel)
        )

    # -- mutations -----------------------------------------------------
    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def remove(self, path: str) -> None:
        self.fs.delete_file(path)

    def rmtree(self, path: str, ignore_errors: bool = True) -> None:
        try:
            self.fs.delete_dir(path)
        except (FileNotFoundError, OSError):
            if not ignore_errors:
                raise

    def replace(self, src: str, dst: str) -> None:
        """Atomic rename where the filesystem has one (local, HDFS);
        copy+delete semantics elsewhere — see the module docstring's
        commit-protocol note."""
        if not self.is_local:
            # some stores refuse move-onto-existing; emulate replace
            if self.exists(dst):
                self.fs.delete_file(dst)
        self.fs.move(src, dst)

    # -- whole-file text/json -----------------------------------------
    def read_text(self, path: str) -> str:
        with self.fs.open_input_stream(path) as f:
            return f.read().decode("utf-8")

    def write_text_atomic(self, path: str, text: str) -> None:
        """Write via tmp + replace so a crash mid-write never leaves a
        half-written file under the final name."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with self.fs.open_output_stream(tmp) as f:
            f.write(text.encode("utf-8"))
        self.replace(tmp, path)

    def read_json(self, path: str) -> dict:
        return json.loads(self.read_text(path))

    def write_json_atomic(self, path: str, obj: dict, **kw) -> None:
        self.write_text_atomic(path, json.dumps(obj, **kw))

    def append_lines(self, path: str, lines: list[str]) -> None:
        """Append text lines (lineage log).  Local filesystems append
        in place; object stores without append fall back to
        read+rewrite — safe under the store's single-writer lock."""
        payload = ("".join(ln + "\n" for ln in lines)).encode("utf-8")
        if self.is_local:
            with self.fs.open_append_stream(path) as f:
                f.write(payload)
            return
        old = b""
        if self.exists(path):
            with self.fs.open_input_stream(path) as f:
                old = f.read()
        with self.fs.open_output_stream(path) as f:
            f.write(old + payload)

    # -- parquet -------------------------------------------------------
    def read_table(self, path: str, columns=None):
        import pyarrow.parquet as pq

        return pq.read_table(path, columns=columns, filesystem=self.fs)

    def write_table(self, table, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(table, path, filesystem=self.fs)

    def read_metadata(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_metadata(path, filesystem=self.fs)

    def parquet_dataset(self, files: list[str]):
        import pyarrow.dataset as pads

        return pads.dataset(files, filesystem=self.fs)

    # Ray Data readers/writers take the pyarrow filesystem directly:
    # rd.read_parquet(paths, filesystem=storefs.fs) /
    # ds.write_parquet(path, filesystem=storefs.fs).


def read_table_any(path: str, filesystem=None, columns=None):
    """Worker-side helper: read a parquet file through an optional
    pyarrow filesystem (None = local path, the fast default)."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns, filesystem=filesystem)
