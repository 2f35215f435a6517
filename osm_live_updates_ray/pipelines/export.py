"""Resumable sharded corpus export — the user-facing sink contract.

The brief's sink rule ("write partitioned parquet so a failed run can
skip finished partitions; never one giant file") is implemented for
STATE by the store's per-tile COW and for bootstrap by
``--pages-shards``; this module gives the LLM-pipeline side the same
property for arbitrary corpus exports: input parquet FILES are hashed
into N shards, each shard is one independent Ray job that reads ONLY
its own files (real read-level pruning, not a post-filter), runs an
optional per-batch transform, writes ``out_dir/shard=<i>/`` and then
commits a ``_SUCCESS`` marker.  A rerun skips every committed shard —
kill-and-resume completes exactly the missing work (pytest pins this,
including that finished shards' files are untouched).

At 100 TB: shards are the unit of retry and of output file layout;
size ``num_shards`` so one shard's rows fit a worker set comfortably
(thousands of shards are fine — each is its own small streamed job).
"""
from __future__ import annotations

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
) -> dict:
    """Export ``input_path`` (a parquet file or directory) to
    ``out_dir/shard=<i>/`` resumably.  Returns
    ``{"written": [...], "skipped": [...]}``."""
    import ray.data as rd

    files = _input_files(input_path)
    os.makedirs(out_dir, exist_ok=True)
    written, skipped = [], []
    for i in range(num_shards):
        mine = files[i::num_shards]  # deterministic file->shard map
        sdir = os.path.join(out_dir, f"shard={i}")
        marker = os.path.join(sdir, "_SUCCESS")
        if os.path.exists(marker):
            skipped.append(i)
            continue
        if not mine:
            os.makedirs(sdir, exist_ok=True)
            open(marker, "w").close()
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
        open(marker, "w").close()
        written.append(i)
    return {"written": written, "skipped": skipped}
