"""Resumable sharded corpus export — the user-facing sink contract.

The brief's sink rule ("write partitioned parquet so a failed run can
skip finished partitions; never one giant file") is implemented for
STATE by the store's per-tile COW and for bootstrap by
``--pages-shards``; this module gives the LLM-pipeline side the same
property for arbitrary corpus exports: input parquet FILES are hashed
into N shards, each shard is one independent Ray job that reads ONLY
its own files (real read-level pruning, not a post-filter), runs an
optional per-batch transform, writes ``out_dir/shard=<i>/`` and then
commits a ``_SUCCESS`` marker recording the shard's exact membership.
A rerun skips every committed shard — kill-and-resume completes
exactly the missing work (pytest pins this, including that finished
shards' files are untouched).

Resume is MEMBERSHIP-CHECKED: each ``_SUCCESS`` marker stores the
shard's file list and the run's ``num_shards``; a rerun recomputes the
membership from the current input listing and refuses to silently skip
a shard whose membership changed (input files added/removed or
``num_shards`` changed between runs would otherwise drop or duplicate
rows in the combined output).  Mismatched shards are re-exported by
default, or the whole run errors with ``on_membership_change="error"``.

At 100 TB: shards are the unit of retry and of output file layout;
size ``num_shards`` so one shard's rows fit a worker set comfortably
(thousands of shards are fine — each is its own small streamed job).
"""
from __future__ import annotations

import json
import os


def _input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def export_sharded(
    input_path: str,
    out_dir: str,
    num_shards: int = 4,
    transform=None,
    columns: list[str] | None = None,
    on_membership_change: str = "reexport",
) -> dict:
    """Export ``input_path`` (a parquet file or directory) to
    ``out_dir/shard=<i>/`` resumably.  Returns
    ``{"written": [...], "skipped": [...], "remapped": [...]}`` where
    ``remapped`` lists committed shards whose recorded membership no
    longer matched the current input listing (re-exported, or raised
    if ``on_membership_change="error"``)."""
    import ray.data as rd

    files = _input_files(input_path)
    os.makedirs(out_dir, exist_ok=True)
    written, skipped, remapped = [], [], []
    for i in range(num_shards):
        mine = files[i::num_shards]  # deterministic file->shard map
        sdir = os.path.join(out_dir, f"shard={i}")
        marker = os.path.join(sdir, "_SUCCESS")
        membership = {"num_shards": num_shards, "files": mine}
        if os.path.exists(marker):
            try:
                with open(marker) as fh:
                    recorded = json.load(fh)
            except (json.JSONDecodeError, OSError):
                recorded = None  # pre-membership marker (or corrupt)
            if recorded == membership:
                skipped.append(i)
                continue
            if on_membership_change == "error":
                raise RuntimeError(
                    f"shard {i} was committed with a different input "
                    f"membership (recorded {recorded!r}); rerun with "
                    f"the original inputs/num_shards or allow "
                    f"re-export"
                )
            remapped.append(i)
        if not mine:
            os.makedirs(sdir, exist_ok=True)
            _commit(marker, membership)
            written.append(i)
            continue
        # a half-written shard from a crashed run is REPLACED: the
        # marker is the commit point, files before it are garbage
        import shutil

        shutil.rmtree(sdir, ignore_errors=True)
        ds = rd.read_parquet(mine, columns=columns)
        if transform is not None:
            ds = ds.map_batches(transform, batch_format="pyarrow")
        ds.write_parquet(sdir)
        _commit(marker, membership)
        written.append(i)
    return {"written": written, "skipped": skipped, "remapped": remapped}


def _commit(marker: str, membership: dict) -> None:
    # write-then-rename so a crash mid-write never leaves a marker
    # that parses as an (empty/partial) membership
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(membership, fh)
    os.replace(tmp, marker)
