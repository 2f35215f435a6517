"""Replication-stream watermark semantics — the reference's
``decideStartSequenceNumber`` tree and up-to-date early exit, mirrored
exactly (reference: src/osm/OsmUpdater.cpp:169-236 decision order,
:115-120 up-to-date check; timestamp→sequence mapping
src/osm/OsmReplicationServerHelper.cpp:109-171).

Decision order (first match wins):
  1. user-specified sequence number          → start there
  2. user-specified timestamp                → newest state with ts <= given
  3. stored watermark, SAME replication source → watermark.seq + 1
     stored watermark, different source        → map watermark.ts → seq
  4. fallback: MAX(object timestamp) in the store → map ts → seq

After deciding: start > latest available sequence ⇒ the store is up to
date — a clean no-op exit (``DatabaseUpToDate``), not an error.

The "replication server" here is a local directory of change windows
(sandbox analog of the reference's HTTP seq-numbered file tree,
src/util/URLHelper.cpp:35-53): files named ``<seq>.parquet`` /
``<seq>.osc`` plus an optional ``states.json`` manifest (the state.txt
analog).  Timestamps are ISO "YYYY-MM-DDTHH:MM:SS" strings compared
lexicographically, exactly like the reference
(OsmReplicationServerHelper.cpp:112-121).
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass


class DatabaseUpToDate(Exception):
    """The store already covers every available change window
    (reference: util::DatabaseUpToDateException)."""


class ReplicationError(Exception):
    """No usable state / no matching state for a timestamp."""


class ReplicationGapWarning(UserWarning):
    """The store/watermark timestamp predates every retained replication
    window: the diffs in the gap are permanently unavailable and catch-up
    starts from the oldest retained window.  The reference THROWS here
    (OsmReplicationServerHelper.cpp:168-170), forcing a re-bootstrap; the
    store-derived fallback paths clamp best-effort instead but must not
    do so silently — the database may be inconsistent for the gap span."""


@dataclass(frozen=True)
class ReplicationState:
    seq: int
    ts: str  # ISO, lexicographically ordered


def state_for_timestamp(
    states: list[ReplicationState], latest: ReplicationState, ts: str,
    clamp_oldest: bool = False, gap_notes: list | None = None,
) -> ReplicationState:
    """Newest state whose timestamp is <= ``ts`` (scan from latest down,
    reference OsmReplicationServerHelper.cpp:150-166).  The found
    state's own window is re-applied — the deliberate overlap-by-one
    the idempotent delete+insert absorbs.

    Raises ``DatabaseUpToDate`` when the latest available state is not
    newer than ``ts`` (reference :115-121).

    ``clamp_oldest`` governs the no-match case (``ts`` predates every
    state): True returns the OLDEST state — right for the STORE-derived
    fallbacks, where a store older than all windows should catch up
    best-effort (the gap is unrecoverable either way); False raises,
    right for a USER-requested timestamp, where a ts older than every
    window is far more likely a typo than an intent."""
    if latest.ts <= ts:
        raise DatabaseUpToDate(
            f"latest replication state ({latest.ts}) is before or equal "
            f"to the timestamp: {ts}"
        )
    for st in sorted(states, key=lambda s: s.seq, reverse=True):
        if st.ts <= ts:
            return st
    if clamp_oldest:
        import warnings

        oldest = min(states, key=lambda s: s.seq)
        msg = (
            f"replication gap: store timestamp {ts} predates the oldest "
            f"retained window (seq {oldest.seq} @ {oldest.ts}); diffs in "
            f"[{ts}, {oldest.ts}) are unavailable — clamping to the oldest "
            f"window; the store may be inconsistent for that span "
            f"(re-bootstrap to be safe)"
        )
        warnings.warn(msg, ReplicationGapWarning, stacklevel=2)
        if gap_notes is not None:
            gap_notes.append(msg)
        return oldest
    raise ReplicationError(f"no replication state at or before timestamp {ts}")


def decide_start_sequence(
    states: list[ReplicationState],
    store,
    requested_seq: int = 0,
    requested_ts: str = "",
    source: str = "",
    gap_notes: list | None = None,
) -> int:
    """The full reference decision tree; returns the first sequence
    number to apply.  Raises ``DatabaseUpToDate`` for the clean no-op
    exit."""
    if not states:
        raise ReplicationError("replication source has no states")
    latest = max(states, key=lambda s: s.seq)

    if requested_seq > 0:
        start = requested_seq
    elif requested_ts:
        start = state_for_timestamp(states, latest, requested_ts).seq
    else:
        wm = store.watermark
        if wm is not None:
            wm_source = wm.get("source") or ""
            if source and wm_source == source:
                # same replication source: resume one past the last
                # completed window (updatesCompleteUntil + 1)
                start = int(wm["seq"]) + 1
            else:
                # different source: sequence numbering is not
                # comparable — fall back to the timestamp
                start = state_for_timestamp(
                    states, latest, wm["ts"], clamp_oldest=True,
                    gap_notes=gap_notes,
                ).seq
        else:
            ts = store.latest_object_timestamp()
            if ts is None:
                raise ReplicationError(
                    "store has no watermark and no objects — bootstrap first"
                )
            start = state_for_timestamp(
                states, latest, ts, clamp_oldest=True, gap_notes=gap_notes,
            ).seq

    if start > latest.seq:
        raise DatabaseUpToDate(
            f"start sequence {start} is past the latest available "
            f"{latest.seq} — store is up to date"
        )
    return start


class LocalReplicationSource:
    """Directory of sequence-numbered change windows.

    Layout: ``<seq>.parquet`` (OSM_CHANGES schema) or ``<seq>.osc``
    files; an optional ``states.json`` (``[{"seq": N, "ts": "..."}]``)
    plays state.txt.  Without the manifest, states are derived from
    each file's max ``ts`` (small dirs only — the manifest is the scale
    path)."""

    _FILE_RE = re.compile(r"^(\d+)\.(parquet|osc|osc\.gz)$")

    def __init__(self, path: str):
        self.path = path
        self._files: dict[int, str] = {}
        for f in glob.glob(os.path.join(path, "*")):
            m = self._FILE_RE.match(os.path.basename(f))
            if m:
                self._files[int(m.group(1))] = f
        if not self._files:
            raise ReplicationError(f"no change windows under {path}")
        manifest = os.path.join(path, "states.json")
        if os.path.exists(manifest):
            with open(manifest) as fh:
                self._states = [
                    ReplicationState(int(s["seq"]), str(s["ts"]))
                    for s in json.load(fh)
                ]
        else:
            self._states = [
                ReplicationState(seq, self._max_ts(f))
                for seq, f in sorted(self._files.items())
            ]

    @property
    def uri(self) -> str:
        return os.path.abspath(self.path)

    def states(self) -> list[ReplicationState]:
        return list(self._states)

    def _max_ts(self, f: str) -> str:
        t = self.load_file(f)
        import pyarrow.compute as pc

        mx = pc.max(t.column("ts")).as_py()
        return mx.strftime("%Y-%m-%dT%H:%M:%S") if mx is not None else ""

    @staticmethod
    def load_file(f: str):
        if f.endswith(".parquet"):
            import pyarrow.parquet as pq

            return pq.read_table(f)
        from ..sources import osc

        return osc.read_osc_file(f, seq=0)

    def load(self, seq: int):
        """One window's change table, its ``seq`` column set."""
        import pyarrow as pa

        t = self.load_file(self._files[seq])
        idx = t.schema.get_field_index("seq")
        return t.set_column(
            idx, "seq", pa.array([seq] * t.num_rows, type=t.schema.field(idx).type)
        )

    def window(self, start_seq: int, max_seq: int | None = None):
        """Concatenated change window [start_seq, min(latest, max_seq)]
        — the reference merges the span into ONE micro-batch
        (OsmUpdater.cpp:122-135)."""
        import pyarrow as pa

        seqs = [
            s
            for s in sorted(self._files)
            if s >= start_seq and (max_seq is None or s <= max_seq)
        ]
        if not seqs:
            raise DatabaseUpToDate("no windows at or past the start sequence")
        tables = [self.load(s) for s in seqs]
        return pa.concat_tables([t.cast(tables[0].schema) for t in tables])


class SeqTreeReplicationSource(LocalReplicationSource):
    """A replication source laid out exactly like the reference's HTTP
    server tree, read from a local root (the transport is the only
    thing the sandbox removes — the path arithmetic is the real one):

        <root>/state.txt                      latest DatabaseState
        <root>/XXX/XXX/XXX.state.txt          per-sequence state
        <root>/XXX/XXX/XXX.osc.gz             change file (or .osc/.parquet)

    Paths are built with ``replication_url.format_sequence_for_url`` /
    ``state_path`` / ``change_file_path`` — the same zero-padded
    ``XXX/XXX/XXX`` arithmetic as
    src/osm/OsmReplicationServerHelper.cpp:64-107 — and state files are
    parsed with the reference's regexes
    (OsmReplicationServerHelper.cpp:210-236)."""

    def __init__(self, path: str):
        from ..sources import replication_url as ru

        self.path = path
        with open(os.path.join(path, ru.PATH_TO_STATE_FILE)) as fh:
            self._latest = ru.parse_state_file(fh.read())
        self._files = {}
        self._states = []
        # walk BACK from the latest sequence while per-seq state files
        # exist (the reference walks the same tree over HTTP, batch=10,
        # OsmReplicationServerHelper.cpp:174-207)
        seq = self._latest.sequence_number
        while seq >= 0:
            frag = ru.format_sequence_for_url(seq)
            sf = os.path.join(path, frag + "." + ru.PATH_TO_STATE_FILE)
            if not os.path.exists(sf):
                break
            with open(sf) as fh:
                st = ru.parse_state_file(fh.read())
            cf = None
            for ext in (".osc.gz", ".osc", ".parquet"):
                cand = os.path.join(path, frag + ext)
                if os.path.exists(cand):
                    cf = cand
                    break
            if cf is None:
                break
            self._files[seq] = cf
            self._states.append(ReplicationState(st.sequence_number, st.ts))
            seq -= 1
        if not self._files:
            raise ReplicationError(f"no change windows under {path}")
        self._states.sort(key=lambda s: s.seq)

    def latest_state(self) -> ReplicationState:
        return ReplicationState(self._latest.sequence_number, self._latest.ts)


def _default_transport(url: str, timeout: float = 30.0) -> bytes:
    """Stdlib HTTP GET (urllib; no extra deps).  Raises
    ``ReplicationError`` on any transport failure — the reference
    aborts the window and keeps the watermark on fetch errors
    (src/osm/OsmReplicationServerHelper.cpp:40-107: cpr status checks
    throw, OsmUpdater catches and leaves state untouched)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if getattr(resp, "status", 200) >= 400:
                raise ReplicationError(
                    f"GET {url} -> HTTP {resp.status}"
                )
            return resp.read()
    except ReplicationError:
        raise
    except (urllib.error.URLError, OSError, ValueError) as e:
        raise ReplicationError(f"GET {url} failed: {e}") from e


class HttpReplicationSource(LocalReplicationSource):
    """The reference's live replication-server transport
    (src/osm/OsmReplicationServerHelper.cpp:40-107) behind the same
    source seam: the layout and path arithmetic are EXACTLY
    :class:`SeqTreeReplicationSource`'s (``state.txt`` at the root,
    ``XXX/XXX/XXX.state.txt`` / ``XXX/XXX/XXX.osc.gz`` per sequence,
    built with the golden-string-tested ``replication_url`` helpers) —
    only the byte transport differs.

    ``transport`` is a ``url -> bytes`` callable (default: stdlib
    urllib GET).  Any transport failure raises
    :class:`ReplicationError`, which the apply path surfaces WITHOUT
    committing — the window aborts and the watermark stays, matching
    the reference's catch-and-keep behavior.  Tests inject a mocked
    transport; nothing in CI touches the network.

    ``max_walk_back`` bounds the per-sequence state walk (the
    reference walks back batch-by-batch only as far as the requested
    timestamp needs; a bound keeps a misconfigured start from crawling
    the whole server history)."""

    def __init__(self, base_url: str, transport=None,
                 max_walk_back: int = 1000):
        from ..sources import replication_url as ru

        self._base = base_url.rstrip("/")
        self._get = transport or _default_transport
        self.path = self._base
        latest_txt = self._get(
            ru.build_url([self._base, ru.PATH_TO_STATE_FILE])
        ).decode("utf-8")
        self._latest = ru.parse_state_file(latest_txt)
        self._files = {}
        self._states = []
        seq = self._latest.sequence_number
        floor = max(0, seq - max_walk_back + 1)
        while seq >= floor:
            frag = ru.format_sequence_for_url(seq)
            try:
                st_txt = self._get(ru.build_url(
                    [self._base, frag + "." + ru.PATH_TO_STATE_FILE]
                )).decode("utf-8")
            except ReplicationError:
                break  # history horizon: older states pruned server-side
            st = ru.parse_state_file(st_txt)
            # change-file URL recorded, bytes fetched lazily in load()
            self._files[seq] = ru.build_url(
                [self._base, ru.change_file_path(seq)]
            )
            self._states.append(ReplicationState(st.sequence_number, st.ts))
            seq -= 1
        if not self._files:
            raise ReplicationError(
                f"no change windows reachable under {self._base}"
            )
        self._states.sort(key=lambda s: s.seq)

    @property
    def uri(self) -> str:
        return self._base

    def latest_state(self) -> ReplicationState:
        return ReplicationState(self._latest.sequence_number, self._latest.ts)

    def load_file(self, f: str):
        from ..sources import osc

        return osc.parse_osc_bytes(self._get(f), seq=0)


def open_replication_source(path: str, transport=None):
    """Pick the source layout: an ``http(s)://`` URI opens the live
    HTTP transport (reference ``-r/--replication-server``); a root
    ``state.txt`` means the reference's XXX/XXX/XXX sequence tree on
    local disk; otherwise the flat ``<seq>.parquet`` dir."""
    if path.startswith(("http://", "https://")):
        return HttpReplicationSource(path, transport=transport)
    if os.path.exists(os.path.join(path, "state.txt")):
        return SeqTreeReplicationSource(path)
    return LocalReplicationSource(path)
