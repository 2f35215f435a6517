"""Property-based tests (hypothesis) for the pure kernels.

These pin the engine's pure functions against independent
re-implementations under randomized inputs — the cheap half of the
reference's micro-benchmark/unit coverage of its hot parsers
(reference benchmarks/osm/OsmObjectHelper.cpp, tests/util/*).
No Ray involved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_live_updates_ray.functions import clip, wkt
from osm_live_updates_ray.functions import text as textfn
from osm_live_updates_ray.stages.dedup import _keep_best


# ---------------------------------------------------------------- text
@given(st.text(max_size=300))
def test_fingerprint_matches_horner_reference(s):
    # independent reference: the classic Horner recurrence in Python
    # arbitrary-precision ints, folded to two's-complement int64
    h = 0
    for b in s.encode("utf-8"):
        h = (h * 1000003 + b) % (1 << 64)
    expect = h - (1 << 64) if h >= (1 << 63) else h
    assert textfn.fingerprint64(s) == expect


@given(st.text(max_size=300))
def test_xml_escape_roundtrip(s):
    esc = textfn.xml_escape(s)
    assert textfn.xml_unescape(esc) == s
    # escaped form carries no raw markup-significant characters
    body = esc
    for ent in ("&amp;", "&lt;", "&gt;", "&quot;", "&apos;"):
        body = body.replace(ent, "")
    assert "<" not in body and ">" not in body and "&" not in body


@given(st.text(max_size=500))
def test_extract_text_byte_identity(s):
    # the north-star invariant: extract(render(text)) == text, byte
    # for byte, for any text the renderer accepts
    html = textfn.render_html(s)
    assert textfn.extract_text(html) == s


# ----------------------------------------------------------------- wkt
_grid = st.integers(min_value=-180 * 10**7, max_value=180 * 10**7)


@given(_grid, _grid)
def test_point_wkt_roundtrip_on_7dp_grid(ilon, ilat):
    # any coordinate on the 7-decimal grid (the reference's canonical
    # precision, Config.h:36) survives format -> parse exactly
    lon, lat = ilon / 10**7, ilat / 10**7
    plon, plat = wkt.parse_point_wkt(wkt.point_wkt(lon, lat))
    assert plon == float(wkt.fmt_coord(lon)) and plat == float(wkt.fmt_coord(lat))
    assert abs(plon - lon) < 1e-7 and abs(plat - lat) < 1e-7


# ---------------------------------------------------------------- clip
@given(
    st.lists(
        st.tuples(
            st.floats(-170, 170, allow_nan=False), st.floats(-80, 80, allow_nan=False)
        ),
        min_size=1,
        max_size=50,
    ),
    st.tuples(
        st.floats(-150, 100, allow_nan=False), st.floats(-70, 40, allow_nan=False)
    ),
)
def test_rect_polygon_equals_bbox(points, origin):
    # a rectangle expressed as a .poly ring must select exactly the
    # bbox set (away from the boundary: ray-cast edge behavior differs
    # from BETWEEN on edges by design, mirroring osmium)
    ox, oy = origin
    bbox = (ox, oy, ox + 37.0, oy + 23.0)
    rx = np.array([bbox[0], bbox[2], bbox[2], bbox[0]])
    ry = np.array([bbox[1], bbox[1], bbox[3], bbox[3]])
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    # exclude points within 1e-9 of an edge (boundary semantics differ)
    near = (
        (np.abs(lon - bbox[0]) < 1e-9)
        | (np.abs(lon - bbox[2]) < 1e-9)
        | (np.abs(lat - bbox[1]) < 1e-9)
        | (np.abs(lat - bbox[3]) < 1e-9)
    )
    got = clip.region_mask_polygon(lon, lat, [(rx, ry)])
    want = clip.region_mask_bbox(lon, lat, bbox)
    assert (got[~near] == want[~near]).all()


# --------------------------------------------------------------- dedup
_TS = [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-06-01"),
       pd.Timestamp("2025-01-01")]

_row = st.tuples(
    st.sampled_from(["node", "way", "relation"]),
    st.integers(0, 3),                      # id: few values -> collisions
    st.integers(1, 3),                      # version
    st.sampled_from(["create", "modify", "delete"]),
    st.sampled_from([0, 1, 2]),             # ts index
    st.integers(0, 2),                      # seq
)


def _brute_force_keep_best(df: pd.DataFrame) -> set[tuple]:
    """Independent re-implementation of the reference comparator
    (OsmFileHelper.h:42-55): per (type, id) keep max version, delete
    beats non-delete at equal version, then latest ts, then latest
    seq, then the earliest original row."""
    winners = {}
    for idx, r in df.iterrows():
        k = (r["type"], r["id"])
        rank = (r["version"], int(r["action"] == "delete"), r["ts"],
                r["seq"], -idx)
        if k not in winners or rank > winners[k][0]:
            winners[k] = (rank, idx)
    return {i for _, i in winners.values()}


@settings(max_examples=200)
@given(st.lists(_row, min_size=1, max_size=40))
def test_keep_best_matches_reference_comparator(rows):
    df = pd.DataFrame(
        {
            "type": [r[0] for r in rows],
            "id": [r[1] for r in rows],
            "version": [r[2] for r in rows],
            "action": [r[3] for r in rows],
            "ts": [_TS[r[4]] for r in rows],
            "seq": [r[5] for r in rows],
        }
    )
    got = set(_keep_best(df).index)
    assert got == _brute_force_keep_best(df)


@settings(max_examples=50)
@given(st.lists(_row, min_size=1, max_size=40))
def test_keep_best_idempotent(rows):
    df = pd.DataFrame(
        {
            "type": [r[0] for r in rows],
            "id": [r[1] for r in rows],
            "version": [r[2] for r in rows],
            "action": [r[3] for r in rows],
            "ts": [_TS[r[4]] for r in rows],
            "seq": [r[5] for r in rows],
        }
    )
    once = _keep_best(df)
    twice = _keep_best(once)
    pd.testing.assert_frame_equal(
        once.sort_index(), twice.sort_index()
    )


# ---------------------------------------------------------------------------
# round-4 third-session kernels
# ---------------------------------------------------------------------------
@settings(max_examples=40)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0, max_size=60,
    )
)
def test_triangle_counts_match_brute_force(edges):
    import itertools

    from osm_live_updates_ray.stages.dedup_docs import triangle_counts

    canon = {(min(a, b), max(a, b)) for a, b in edges}
    df = pd.DataFrame(
        {"id_a": [a for a, _ in canon], "id_b": [b for _, b in canon]}
    )
    got = dict(zip(*(triangle_counts(df)[c]
                     for c in ("doc_id", "triangles"))))
    # brute force over all node triples
    nodes = sorted({n for e in canon for n in e})
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if ({(x, y), (x, z), (y, z)} <= canon):
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want


@settings(max_examples=40)
@given(st.lists(st.text(alphabet="ab c", max_size=12), min_size=0,
                max_size=8))
def test_hash_embed_is_additive_in_tokens(texts):
    """embed(doc) == sum over its tokens of embed(single-token doc):
    the hashing trick is linear by construction — the property that
    makes the kernel map-side combinable at any batch split."""
    import numpy as np

    from osm_live_updates_ray.functions import hashing

    def emb(tokens):
        v = np.zeros(16, dtype=np.int64)
        for w in tokens:
            h = int(hashing.hash_strings_poly([w]).view(np.uint64)[0])
            v[h % 16] += 1 - 2 * ((h >> 4) & 1)
        return v

    for tx in texts:
        toks = tx.split(" ")
        whole = emb(toks)
        parts = sum((emb([t]) for t in toks),
                    np.zeros(16, dtype=np.int64))
        assert (whole == parts).all()


@settings(max_examples=40)
@given(st.text(max_size=200))
def test_entropy_bounds(text):
    """0 <= H <= ln(distinct codepoints) for any text (engine kernel
    formula), with H == 0 iff <= 1 distinct codepoint."""
    import numpy as np

    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = len(cps)
    if n == 0:
        return
    _, c = np.unique(cps, return_counts=True)
    H = float(np.log(n) - (c * np.log(c)).sum() / n)
    assert -1e-12 <= H <= np.log(len(c)) + 1e-12
    if len(c) == 1:
        assert abs(H) < 1e-12
    else:
        assert H > 0
