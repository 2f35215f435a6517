"""Replication-server URL / path arithmetic — the reference's pure-string
helpers, offline (no HTTP in this sandbox; the transport seam stays
``LocalReplicationSource``-shaped).

Reference parity:
  * build_url              — src/util/URLHelper.cpp:39-50
  * format_sequence_for_url — src/util/URLHelper.cpp:53-72 (zero-pad to 9
    digits, split into XXX/XXX/XXX; [0, 999999999] else ValueError)
  * encode_for_url_query   — src/util/URLHelper.cpp:75-95 (RFC-3986
    unreserved set passes, everything else %XX upper-hex)
  * is_valid_uri           — src/util/URLHelper.cpp:98-101
  * parse_state_file       — src/osm/OsmReplicationServerHelper.cpp:210-236
    ("sequenceNumber=<d+>" + osmosis-escaped "timestamp=...T..\\:..\\:..Z")
  * state_path/change_file_path — OsmReplicationServerHelper.cpp:64-107
    (state.txt at the root, "XXX/XXX/XXX.state.txt" per sequence,
    "XXX/XXX/XXX.osc.gz" change files; config/Constants.h:45-88)
  * educated_guess_sequence — OsmReplicationServerHelper.cpp:239-259
    (planet.osm.org minute/hour/day diff-count guess)

Golden strings mirrored from the reference's own unit tests
(tests/util/URLHelper.cpp) in tests/test_watermark.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

MIN_SEQ_NUMBER = 0
MAX_SEQ_NUMBER = 999_999_999
_FORMATTED_LEN = 9

#: reference config/Constants.h:45-46,88
OSM_CHANGE_FILE_EXTENSION = ".osc"
GZIP_EXTENSION = ".gz"
PATH_TO_STATE_FILE = "state.txt"

_UNRESERVED = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.~"
)

_SEQ_RE = re.compile(r"sequenceNumber=(\d+)")
# osmosis state files escape colons: timestamp=2025-01-04T21\:21\:15Z
_TS_RE = re.compile(
    r"timestamp=([0-9]{4}-[0-9]{2}-[0-9]{2}T"
    r"[0-9]{2}\\:[0-9]{2}\\:[0-9]{2}Z)"
)
_URI_RE = re.compile(
    r"((\w+:\/\/)[-a-zA-Z0-9:@;?&=\/%\+\.\*!'\(\),\$_\{\}\^~\[\]`#|]+)"
)


def build_url(path_segments: list[str]) -> str:
    """Join segments with '/' (no normalization — reference parity:
    an empty list yields "")."""
    return "/".join(path_segments)


def format_sequence_for_url(sequence_number: int) -> str:
    """Sequence → zero-padded ``XXX/XXX/XXX`` path fragment.

    >>> format_sequence_for_url(6177383)
    '006/177/383'
    """
    if (
        sequence_number < MIN_SEQ_NUMBER
        or sequence_number > MAX_SEQ_NUMBER
    ):
        raise ValueError("sequence number is invalid")
    s = str(sequence_number).zfill(_FORMATTED_LEN)
    return f"{s[0:3]}/{s[3:6]}/{s[6:9]}"


def parse_sequence_from_path(path: str) -> int:
    """Inverse of :func:`format_sequence_for_url` (accepts a longer path
    whose TAIL is the XXX/XXX/XXX fragment plus an extension)."""
    m = re.search(r"(\d{3})/(\d{3})/(\d{3})(?:\.\w|$)", path)
    if not m:
        raise ValueError(f"no sequence path fragment in {path!r}")
    return int("".join(m.groups()))


def encode_for_url_query(value: str) -> str:
    """Percent-encode for a URL query (reference's strict unreserved
    set; bytes outside it become %XX upper-hex per utf-8 byte)."""
    out = []
    for b in value.encode("utf-8"):
        c = chr(b)
        if c in _UNRESERVED:
            out.append(c)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def is_valid_uri(uri: str) -> bool:
    return _URI_RE.fullmatch(uri) is not None


def state_path(sequence_number: int | None = None) -> str:
    """Relative path of a state file: the latest (root ``state.txt``) or
    a specific sequence's ``XXX/XXX/XXX.state.txt``."""
    if sequence_number is None:
        return PATH_TO_STATE_FILE
    return (
        format_sequence_for_url(sequence_number) + "." + PATH_TO_STATE_FILE
    )


def change_file_path(sequence_number: int) -> str:
    """Relative path of a change file: ``XXX/XXX/XXX.osc.gz``."""
    return (
        format_sequence_for_url(sequence_number)
        + OSM_CHANGE_FILE_EXTENSION
        + GZIP_EXTENSION
    )


@dataclass(frozen=True)
class DatabaseState:
    """Parsed state.txt (reference OsmDatabaseState): ``ts_raw`` keeps
    the osmosis-escaped form the reference compares lexicographically;
    ``ts`` is the engine-normalized "YYYY-MM-DDTHH:MM:SS"."""

    sequence_number: int
    ts_raw: str

    @property
    def ts(self) -> str:
        return self.ts_raw.replace("\\:", ":").rstrip("Z")


def parse_state_file(text: str) -> DatabaseState:
    """Extract (sequenceNumber, timestamp) from a state.txt body.

    Mirrors extractStateFromStateFile
    (OsmReplicationServerHelper.cpp:210-236): regex search anywhere in
    the body, both fields required."""
    m = _SEQ_RE.search(text)
    if not m:
        raise ValueError(
            f"could not extract sequence number from state file: {text!r}"
        )
    seq = int(m.group(1))
    mt = _TS_RE.search(text)
    if not mt:
        raise ValueError(
            "timestamp of latest database state could not be fetched"
        )
    return DatabaseState(seq, mt.group(1))


def render_state_file(seq: int, ts: str) -> str:
    """Inverse of :func:`parse_state_file` (osmosis escaping), used by
    tests and the local seq-tree fixture writer."""
    raw = ts.rstrip("Z").replace(":", "\\:") + "Z"
    return f"#Sat Jan 01 00:00:00 UTC 2000\nsequenceNumber={seq}\ntimestamp={raw}\n"


_PLANET_PREFIX = "https://planet.osm.org/replication/"
_GRANULARITY_SEC = {"minute/": 60, "hour/": 3600, "day/": 86400}


def educated_guess_sequence(
    timestamp: str, latest_sequence: int, server_uri: str, now: str
) -> int:
    """Guess the sequence nearest ``timestamp`` by diff-count arithmetic
    — only valid for the planet minute/hour/day servers; -1 otherwise
    (OsmReplicationServerHelper.cpp:239-259).  ``now`` is explicit
    (the reference uses wall-clock; determinism for tests)."""
    if not server_uri.startswith(_PLANET_PREFIX):
        return -1
    for suffix, sec in _GRANULARITY_SEC.items():
        if server_uri.endswith(suffix):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S"
            t0 = datetime.strptime(timestamp.rstrip("Z"), fmt)
            t1 = datetime.strptime(now.rstrip("Z"), fmt)
            since = int((t1 - t0).total_seconds()) // sec
            return latest_sequence - since
    return -1
