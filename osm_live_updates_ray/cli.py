"""CLI — the engine analog of the reference's option surface
(reference: src/config/Config.cpp:34-420; POPL options listed in
include/config/Constants.h:426-541).

    python -m osm_live_updates_ray apply --state DIR --input PATH...
        [--max-sequence-number N] [--bbox MINLON,MINLAT,MAXLON,MAXLAT]
        [--batch-size N] [--statistics] [--dry-run]
    python -m osm_live_updates_ray bootstrap --state DIR --pages DIR
        --nodes F --ways F --relations F
    python -m osm_live_updates_ray corpus --input CORPUS --out DIR
        [--format parquet|jsonl|csv] [--dedup exact|minhash|none]
        [--langs en,de] [--min-chars N] [--stats]

Mapping to the reference flags:
  --input            <- -i/--input (local change files; .osc/.osc.gz/.parquet)
  --max-sequence-number <- same (caps the window)
  --bbox             <- --bbox (clip the change window to a region)
  --batch-size       <- --batch-size (lookup chunking)
  --statistics       <- --statistics (print the summary counters/timers)
  --output           <- -o/--output file mode: compute everything, write
                        the delete/insert op stream to files, do NOT
                        commit (SparqlWrapper.cpp:88-146 short-circuit)
  --dry-run          <- classification-only probe: report the would-be
                        mutation counts, compute no geometry
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _load_changes(paths: list[str], max_seq: int | None):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .sources import osc

    tables = []
    for pattern in paths:
        for p in sorted(glob.glob(pattern)) or [pattern]:
            if p.endswith(".parquet"):
                tables.append(pq.read_table(p))
            else:
                tables.append(osc.read_osc_file(p, seq=len(tables)))
    t = pa.concat_tables([x.cast(tables[0].schema) for x in tables])
    if max_seq is not None:
        t = t.filter(pc.less_equal(t.column("seq"), max_seq))
    return t


def _clip_bbox(changes, bbox: str):
    """--bbox clip (reference M10, applyBoundaries): keep changes whose
    node position falls in the box; ways/relations are kept (complete-
    ways-style completeness — their members are reconstructed)."""
    import numpy as np
    import pyarrow as pa

    min_lon, min_lat, max_lon, max_lat = _parse_bbox(bbox)
    lon = changes.column("lon").to_numpy(zero_copy_only=False)
    lat = changes.column("lat").to_numpy(zero_copy_only=False)
    types = np.asarray(changes.column("type").to_pylist(), dtype=object)
    inside = (
        (lon >= min_lon) & (lon <= max_lon) & (lat >= min_lat) & (lat <= max_lat)
    )
    keep = (types != "node") | inside
    return changes.filter(pa.array(keep))


class UserInputError(ValueError):
    """Argument-validation failure — gets the one-line exit path.
    Deliberately distinct from plain ValueError so an internal
    ValueError raised deep inside a stage keeps its traceback."""


def _parse_bbox(bbox: str) -> tuple[float, float, float, float]:
    """Validate --bbox like the reference's Config checks
    (Config.cpp:267-339): 4 comma-separated floats, min < max."""
    parts = bbox.split(",")
    if len(parts) != 4:
        raise UserInputError(
            f"--bbox needs minlon,minlat,maxlon,maxlat (got {bbox!r})"
        )
    try:
        min_lon, min_lat, max_lon, max_lat = (float(x) for x in parts)
    except ValueError:
        raise UserInputError(f"--bbox coordinates must be numbers (got {bbox!r})")
    if not (min_lon < max_lon and min_lat < max_lat):
        raise UserInputError(f"--bbox min must be < max (got {bbox!r})")
    return min_lon, min_lat, max_lon, max_lat


def _sniff_format(path: str, forced: str | None) -> str:
    if forced:
        return forced
    p = path.rstrip("/")
    if p.endswith((".jsonl", ".jsonl.gz", ".json")):
        return "jsonl"
    if p.endswith(".csv"):
        return "csv"
    if os.path.isdir(p):
        for f in sorted(os.listdir(p)):
            if f.endswith((".jsonl", ".json")):
                return "jsonl"
            if f.endswith(".csv"):
                return "csv"
            if f.endswith(".parquet"):
                return "parquet"
    return "parquet"


def _cmd_corpus(args, rd) -> int:
    """The LLM-pipeline CLI surface: read (any supported corpus
    format) -> language/length filter -> dedup -> parquet out, with
    per-stage counters under --stats.  Every stage is the battery's
    own operator — the command is plumbing, not new semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages import dedup_docs

    fmt = _sniff_format(args.input, args.format)
    if fmt == "jsonl":
        from .sources import text_formats

        ds = text_formats.read_documents_jsonl(args.input)
    elif fmt == "csv":
        from .sources import text_formats

        ds = text_formats.read_documents_csv(args.input)
    else:
        ds = rd.read_parquet(args.input)
    stats: dict[str, int] = {}
    if args.stats:
        ds = ds.materialize()
        stats["rows_in"] = ds.count()

    langs = (set(args.langs.split(",")) if args.langs else None)
    min_chars = int(args.min_chars)
    if langs is not None or min_chars > 0:

        def keep(t: pa.Table) -> pa.Table:
            mask = pa.array([True] * t.num_rows)
            if langs is not None:
                mask = pc.and_(
                    mask,
                    pc.is_in(t.column("lang"),
                             value_set=pa.array(sorted(langs))),
                )
            if min_chars > 0:
                nc = (t.column("n_chars")
                      if "n_chars" in t.column_names
                      else pc.utf8_length(t.column("text")))
                mask = pc.and_(mask, pc.greater_equal(
                    nc, pa.scalar(min_chars, type=pa.int64())))
            return t.filter(mask)

        ds = ds.map_batches(keep, batch_format="pyarrow")
        if args.stats:
            ds = ds.materialize()
            stats["rows_after_filter"] = ds.count()

    if args.dedup == "exact":
        ds = dedup_docs.dedup_exact(ds)
    elif args.dedup == "minhash":
        import numpy as np
        import ray

        cand = dedup_docs.minhash_candidate_pairs(ds)
        pairs = dedup_docs.verify_pairs_distributed(
            cand, ds, threshold=args.minhash_threshold
        ).to_pandas()
        comp = dedup_docs.connected_components(
            pairs.rename(columns={"new_id": "id_a", "match_id": "id_b"})
            if "new_id" in pairs.columns else pairs
        )
        losers = comp.loc[comp["doc_id"] != comp["component"],
                          "doc_id"].to_numpy(dtype=np.int64)
        losers.sort()
        ref = ray.put(losers)

        def drop(t: pa.Table) -> pa.Table:
            lo = ray.get(ref)
            ids = t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(lo):
                pos = np.clip(np.searchsorted(lo, ids), 0, len(lo) - 1)
                m = ~(lo[pos] == ids)
            else:
                m = np.ones(len(ids), dtype=bool)
            return t.filter(pa.array(m))

        ds = ds.map_batches(drop, batch_format="pyarrow")

    os.makedirs(args.out, exist_ok=True)
    if args.stats:
        ds = ds.materialize()
        stats["rows_out"] = ds.count()
        ds.write_parquet(args.out)
    else:
        # no --stats: one streamed pass straight into the sink — the
        # corpus is never pinned in the object store; rows_out comes
        # from the written files' parquet metadata (free)
        ds.write_parquet(args.out)
        import pyarrow.parquet as pq

        stats["rows_out"] = sum(
            pq.ParquetFile(os.path.join(args.out, f)).metadata.num_rows
            for f in os.listdir(args.out) if f.endswith(".parquet")
        )
    print(json.dumps({"status": "ok", "out": args.out,
                      "format": fmt, "dedup": args.dedup, **stats}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="osm_live_updates_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("apply", help="apply a change window to a state store")
    a.add_argument("--state", required=True)
    a.add_argument("--input", nargs="+", default=None,
                   help=".osc/.osc.gz/.parquet change files")
    a.add_argument("--replication", default=None,
                   help="replication dir of <seq>.parquet/.osc windows "
                        "(XOR --input; reference -r/--replication-server)")
    a.add_argument("--sequence-number", type=int, default=0,
                   help="start from this sequence (replication mode)")
    a.add_argument("--timestamp", default="",
                   help="start from this ISO timestamp (replication mode)")
    a.add_argument("--max-sequence-number", type=int, default=None)
    a.add_argument("--bbox", default=None,
                   help="minlon,minlat,maxlon,maxlat clip")
    a.add_argument("--polygon", default=None,
                   help=".poly file clip (XOR --bbox; reference "
                        "--polygon, Config.cpp:267-339)")
    a.add_argument("--extract-strategy", default=None,
                   choices=["simple", "complete_ways", "smart"],
                   help="clip completeness (default smart; reference "
                        "-s/--extract-strategy)")
    a.add_argument("--batch-size", type=int, default=None)
    a.add_argument("--statistics", action="store_true")
    a.add_argument("--output", default=None, metavar="DIR",
                   help="file-sink audit mode (reference -o/--output): "
                        "compute the full delta, write the would-be "
                        "delete/insert op stream to DIR as Parquet + "
                        "ops.jsonl, commit NOTHING")
    a.add_argument("--dry-run", action="store_true",
                   help="compute the classification, report counts, "
                        "do not commit")
    a.add_argument("--enforce-watermark", action="store_true")

    c = sub.add_parser(
        "corpus",
        help="training-data pipeline over a documents corpus "
             "(read -> filter -> dedup -> partitioned parquet)",
    )
    c.add_argument("--input", required=True,
                   help="documents corpus: parquet file/dir, .jsonl(.gz) "
                        "file/dir, or .csv (format sniffed from the "
                        "extension unless --format is given)")
    c.add_argument("--format", choices=["parquet", "jsonl", "csv"],
                   default=None)
    c.add_argument("--out", required=True, help="output parquet dir")
    c.add_argument("--dedup", choices=["exact", "minhash", "none"],
                   default="exact")
    c.add_argument("--minhash-threshold", type=float, default=0.8)
    c.add_argument("--langs", default=None,
                   help="comma-separated language allowlist")
    c.add_argument("--min-chars", type=int, default=0)
    c.add_argument("--stats", action="store_true",
                   help="print per-stage row counts (materializes "
                        "between stages; omit for one streamed pass)")

    b = sub.add_parser("bootstrap", help="build a state store")
    b.add_argument("--state", required=True)
    b.add_argument("--pages", required=True, help="pages parquet dir/file")
    b.add_argument("--nodes", required=True)
    b.add_argument("--ways", required=True)
    b.add_argument("--relations", required=True)
    b.add_argument("--resume", action="store_true",
                   help="re-open an existing state dir and skip phases "
                        "already committed (crash recovery)")
    b.add_argument("--pages-shards", type=int, default=0,
                   help="split the pages input into N shard groups and "
                        "build the two big phases MID-PHASE-resumably: "
                        "a killed run redoes only unsealed shards "
                        "(combine with --resume)")

    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # `ray job submit` readiness: honor a cluster address from the
        # environment (RAY_ADDRESS is set inside job containers); only
        # default to a fresh local instance when none is configured
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False, logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "bootstrap":
            import pyarrow.parquet as pq

            from .pipelines import static_join

            shards = None
            if args.pages_shards:
                files = sorted(
                    glob.glob(os.path.join(args.pages, "*.parquet"))
                ) or [args.pages]
                import numpy as _np

                k = max(1, min(args.pages_shards, len(files)))
                shards = [list(g) for g in _np.array_split(files, k)]
            static_join.build_state(
                args.state,
                rd.read_parquet(args.pages),
                pq.read_table(args.nodes),
                pq.read_table(args.ways),
                pq.read_table(args.relations),
                resume=args.resume,
                pages_shards=shards,
            )
            print(json.dumps({"status": "ok", "state": args.state}))
            return 0

        if args.cmd == "corpus":
            return _cmd_corpus(args, rd)

        from .config import EngineConfig
        from .pipelines import update
        from .state.store import StateStore

        cfg = EngineConfig()
        if args.batch_size:
            cfg.batch_size = args.batch_size
        if bool(args.input) == bool(args.replication):
            print(json.dumps({"error": "exactly one of --input / --replication"}))
            return 2
        store = StateStore(args.state, cfg)
        source = None
        if args.replication:
            # the reference's pull-and-apply path (3.1): watermark
            # decision tree + up-to-date early exit, then the window
            # span merged into one micro-batch
            from .pipelines import watermark as wmk

            src = wmk.open_replication_source(args.replication)
            source = src.uri
            wm_notes: list[str] = []
            try:
                start = wmk.decide_start_sequence(
                    src.states(), store,
                    requested_seq=args.sequence_number,
                    requested_ts=args.timestamp,
                    source=src.uri,
                    gap_notes=wm_notes,
                )
                changes = src.window(start, args.max_sequence_number)
            except wmk.DatabaseUpToDate as e:
                # clean no-op exit (reference apps/osm-live-updates.cpp:37-39)
                print(json.dumps({"status": "up-to-date", "detail": str(e)}))
                return 0
        else:
            changes = _load_changes(args.input, args.max_sequence_number)
        if args.bbox and args.polygon:
            # reference validation: --bbox XOR --polygon (Config.cpp:267-339)
            print(json.dumps({"error": "--bbox and --polygon are exclusive"}))
            return 2
        if args.polygon or (args.bbox and args.extract_strategy):
            from .functions import clip as clipfn

            strategy = args.extract_strategy or "smart"
            if args.polygon:
                rings = clipfn.parse_poly_file(args.polygon)
                inside = lambda lo, la: clipfn.region_mask_polygon(lo, la, rings)
            else:
                bbox = _parse_bbox(args.bbox)
                inside = lambda lo, la: clipfn.region_mask_bbox(lo, la, bbox)
            changes = clipfn.clip_changes(changes, inside, strategy)
        elif args.bbox:
            changes = _clip_bbox(changes, args.bbox)
        if args.dry_run:
            from .stages.dedup import dedup_table
            from .stages.delta import classify

            plan = classify(dedup_table(changes), store)
            out = {"dry_run": True, "would_apply": not plan.is_empty()}
            out.update(
                {
                    k: int(len(getattr(plan, k)))
                    for k in ("created_nodes", "modified_nodes", "deleted_nodes",
                              "ways_to_update_geometry",
                              "relations_to_update_geometry")
                }
            )
            print(json.dumps(out))
            return 0
        summary = update.apply_changes(
            store, changes, cfg, enforce_watermark=args.enforce_watermark,
            source=source, emit_ops_dir=args.output,
        )
        if source is not None and wm_notes:
            # surface the replication-gap warning in the apply summary
            # (the clamp is best-effort catch-up, never silent)
            summary["warnings"] = list(wm_notes)
        if args.statistics:
            print(json.dumps(summary, indent=1))
        else:
            print(json.dumps({k: summary[k] for k in
                              ("deduped_rows", "dirty_cells", "tiles_rewritten",
                               "empty", "emitted_ops", "ops_dir", "warnings")
                              if k in summary}))
        return 0
    except (FileNotFoundError, NotADirectoryError, UserInputError) as e:
        # user-input errors get a one-line message, not a traceback
        # (reference EXCEPTION exit, apps/osm-live-updates.cpp:40-44)
        print(json.dumps({"error": f"{type(e).__name__}: {e}"}), file=sys.stderr)
        return 1
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
