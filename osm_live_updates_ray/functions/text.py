"""Text kernels: canonical HTML->text extraction, language id, quality
scoring, token counting, fingerprinting.

The extractor is the engine's single canonical implementation — the
per-row invariant from BASELINE.json's input_hint is that extracted
``text`` is byte-identical per ``url`` across runs and parallelism
levels, so there is exactly one extractor, it is pure, and it is
versioned.  The escape/unescape pair mirrors the reference's XML
encode/decode surface (reference: src/util/XmlHelper.cpp:109-179 —
``& " ' < > \\n \\r \\t``).
"""

from __future__ import annotations

import re

import numpy as np

EXTRACTOR_VERSION = 1

# escape table — same character set the reference escapes
# (src/util/XmlHelper.cpp:109-145)
_ESCAPES = [
    ("&", "&amp;"),  # must be first
    ('"', "&quot;"),
    ("'", "&apos;"),
    ("<", "&lt;"),
    (">", "&gt;"),
]


def xml_escape(s: str) -> str:
    for ch, rep in _ESCAPES:
        s = s.replace(ch, rep)
    return s


def xml_unescape(s: str) -> str:
    for ch, rep in reversed(_ESCAPES):
        s = s.replace(rep, ch)
    return s


_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.S)


def render_html(text: str, lon: float | None = None, lat: float | None = None) -> bytes:
    """Deterministic page template whose <article> body round-trips the
    text byte-exactly through :func:`extract_text`."""
    geo = ""
    if lon is not None and lat is not None:
        # shortest round-trip repr: parses back to the EXACT double, so
        # geocoding is bit-identical to the source coordinate (repr
        # goes scientific for |v| < 1e-4 — the geocoder regexes accept
        # the exponent form)
        geo = f'<meta name="geo.position" content="{lat!r};{lon!r}"/>'
    body = xml_escape(text)
    return (
        f"<html><head>{geo}<title>page</title></head>"
        f"<body><nav>nav boilerplate</nav><article>{body}</article>"
        f"<footer>footer boilerplate</footer></body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """THE canonical extractor (version {EXTRACTOR_VERSION}).

    Pulls the <article> body and unescapes it.  Pure function of the
    html bytes — no randomness, no environment dependence — so the
    byte-identical-text-per-url invariant holds by construction.
    """
    m = _ARTICLE_RE.search(html)
    if not m:
        return ""
    return xml_unescape(m.group(1).decode("utf-8"))


def extract_text_batch(html) -> "pa.Array":
    """Vectorized :func:`extract_text` over an Arrow binary array —
    RE2 extract + literal substring unescapes, all C++ kernels; falls
    back to the per-row canonical extractor on any per-batch kernel
    failure (e.g. invalid UTF-8) so the byte-identity invariant is
    preserved either way (equality pinned by pytest)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        m = pc.extract_regex(html, rb"(?s)<article>(?P<body>.*?)</article>")
        body = pc.cast(pc.struct_field(m, "body"), pa.string())
        for ch, rep in reversed(_ESCAPES):
            body = pc.replace_substring(body, pattern=rep, replacement=ch)
        return pc.fill_null(body, "")
    except pa.ArrowInvalid:
        return pa.array(
            [extract_text(h) for h in html.to_pylist()], type=pa.string()
        )


_GEO_RE = re.compile(
    rb'geo\.position" content="(-?[\d.]+(?:[eE][-+]?\d+)?);'
    rb'(-?[\d.]+(?:[eE][-+]?\d+)?)"'
)


def extract_geo(html: bytes) -> tuple[float, float] | None:
    """(lon, lat) from the geo.position meta tag, if present."""
    m = _GEO_RE.search(html)
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    return lon, lat


# ---------------------------------------------------------------------------
# tokenization / quality
# ---------------------------------------------------------------------------
_WS_RE = re.compile(r"\s+")
_BPE_ISH_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokenization (any whitespace run)."""
    t = text.strip()
    return _WS_RE.split(t) if t else []


def bpe_ish_tokens(text: str) -> list[str]:
    """BPE-ish regex tokenization: letter runs, digit runs, single
    punctuation — a deterministic proxy for subword token counting."""
    return _BPE_ISH_RE.findall(text)


_STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "this", "was", "are", "be", "at", "by", "an",
}

_PUNCT = set(".,;:!?()[]{}'\"-")


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality-scoring features (length / punctuation /
    stopword ratios), in the spirit of C4/Gopher-style filters."""
    toks = ws_tokens(text)
    n_tok = len(toks)
    n_char = len(text)
    n_punct = sum(1 for c in text if c in _PUNCT)
    n_stop = sum(1 for t in toks if t.lower() in _STOPWORDS)
    mean_tok = (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0
    return {
        "n_chars": float(n_char),
        "n_tokens": float(n_tok),
        "mean_token_len": mean_tok,
        "punct_ratio": (n_punct / n_char) if n_char else 0.0,
        "stopword_ratio": (n_stop / n_tok) if n_tok else 0.0,
    }


# ---------------------------------------------------------------------------
# language id (n-gram-frequency heuristic; no external models)
# ---------------------------------------------------------------------------
_LANG_MARKERS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "is", "you", "that", "with"},
    "de": {"der", "die", "und", "ist", "nicht", "das", "ein"},
    "fr": {"le", "la", "les", "est", "une", "dans", "pas"},
    "es": {"el", "la", "los", "es", "una", "que", "por"},
    "zh": set(),  # handled by script detection below
}


def lang_id(text: str) -> str:
    """Tiny deterministic language heuristic: CJK script share, then
    stopword-marker votes; 'und' (undetermined) when nothing matches."""
    if not text:
        return "und"
    cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
    if cjk > len(text[:2000]) * 0.05:
        return "zh"
    toks = [t.lower() for t in ws_tokens(text[:4000])]
    tokset = set(toks)
    best, best_n = "und", 0
    for lang in sorted(_LANG_MARKERS):
        n = len(tokset & _LANG_MARKERS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best


# ---------------------------------------------------------------------------
# fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------
_FP_BASE = np.uint64(1000003)


def fingerprint64(text: str) -> int:
    """Rolling polynomial hash over UTF-8 bytes, mod 2^64.

    Fully vectorized: h = sum(b_i * BASE^(n-1-i)) — uint64 multiply /
    cumprod / sum wrap mod 2^64 exactly, so this equals the Horner
    recurrence ``h = h*BASE + b`` without a Python loop.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n == 0:
        return 0
    with np.errstate(over="ignore"):
        pows = np.full(n, _FP_BASE, dtype=np.uint64)
        pows[0] = 1
        pows = np.cumprod(pows)[::-1]  # BASE^(n-1) ... BASE^0, mod 2^64
        h = np.sum(data * pows, dtype=np.uint64)
    return int(h.astype(np.int64))


#: BASE is odd, hence invertible mod 2^64 — the batch kernel rewrites
#: each doc's power ladder in GLOBAL byte positions g:
#: H = (Σ b_g · BASE^{-g}) · BASE^{g0+L-1}, so ONE cumprod pair serves
#: the whole batch instead of a per-doc cumprod.
_FP_INV = np.uint64(pow(1000003, -1, 1 << 64))


def fingerprint64_batch(strings) -> np.ndarray:
    """Vectorized :func:`fingerprint64` over an Arrow string array (or
    list of str) — one flat pass over the concatenated utf-8 buffer,
    no per-row Python.  Returns int64; equals fingerprint64 per row
    (pinned by pytest)."""
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), type=pa.string())
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # large_string carries int64 offsets — reading them as int32 would
    # silently misread every boundary (ADVICE r3)
    off_dtype = np.int64 if pa.types.is_large_string(strings.type) else np.int32
    bufs = strings.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        strings.offset : strings.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    base = off[0]
    flat = data[off[0] : off[-1]].astype(np.uint64)
    starts = off[:-1] - base
    ends = off[1:] - base
    lens = ends - starts
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    with np.errstate(over="ignore"):
        ppow = np.full(len(flat), _FP_BASE, dtype=np.uint64)
        ppow[0] = np.uint64(1)
        np.cumprod(ppow, out=ppow)  # BASE^g mod 2^64
        ipow = np.full(len(flat), _FP_INV, dtype=np.uint64)
        ipow[0] = np.uint64(1)
        np.cumprod(ipow, out=ipow)  # BASE^-g mod 2^64
        flat *= ipow
        cs = np.zeros(len(flat) + 1, dtype=np.uint64)
        np.cumsum(flat, out=cs[1:])  # wraps mod 2^64
        seg = cs[ends] - cs[starts]  # uint64 wrap-subtract == mod sum
        h = seg * ppow[np.maximum(ends - 1, 0)]
    return np.where(lens > 0, h, np.uint64(0)).view(np.int64)
