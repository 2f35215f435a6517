"""Document deduplication stages — the training-data-pipeline ops the
engine adds beyond the reference's own operators (per the build brief):
exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard verify.

Ray Data shapes (per the aggregation-at-scale pattern):
  * exact:   content-hash in map_batches -> groupby(hash) -> keep first
             (hash-partition + per-group first == exact dedup)
  * minhash: shingle+sign per batch -> explode to (band, band_hash, id)
             rows -> groupby band bucket -> candidate pairs -> verify
             Jaccard on the true shingle sets -> connected components
             via iterated min-label propagation (no driver union-find)
  * simhash: 64-bit signature per doc; near-dup = hamming <= k within
             LSH buckets on 16-bit sub-bands
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DEFAULT_CONFIG as _GATES
from ..functions import bloom, hashing


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = hashing.hash_strings(batch.column(text_col).to_pylist())
    return batch.append_column("content_hash", pa.array(h))


def tag_content_fold(batch: pa.Table, text_col: str = "text",
                     n_shuffle_buckets: int = 64) -> pa.Table:
    """content_hash + coarse ``fold`` shuffle-key columns in one pass —
    the shared tagging step of every exact-dedup flavor (dedup_exact,
    the dedup_exact battery entry, training_mix)."""
    batch = add_content_hash(batch, text_col)
    fold = hashing.fold_int64(
        batch.column("content_hash").to_numpy(zero_copy_only=False),
        n_shuffle_buckets,
    )
    return batch.append_column("fold", pa.array(fold))


def tag_hash128(batch: pa.Table, id_col: str = "doc_id",
                text_col: str = "text",
                n_shuffle_buckets: int = 64) -> pa.Table:
    """(id, h1, h2, fold) projection — the 128-bit content fingerprint
    plus a coarse shuffle key; the TEXT never leaves the scan task."""
    h1, h2 = hashing.hash_strings128(batch.column(text_col).to_pylist())
    fold = hashing.fold_pair_int64(h1, h2, n_shuffle_buckets)
    return pa.table({
        id_col: batch.column(id_col).combine_chunks(),
        "h1": pa.array(h1), "h2": pa.array(h2), "fold": pa.array(fold),
    })


def _hash_group_marks(g: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per fold group (vectorized): rows annotated with their (h1, h2)
    group size and min id.  Singleton hash groups are definitively
    unique texts; multi-member groups are either true duplicates or
    (vanishingly rare) 128-bit collisions — downstream verifies those
    few on the actual text."""
    ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h1 = g.column("h1").to_numpy(zero_copy_only=False)
    h2 = g.column("h2").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h2, h1))
    ids, h1, h2 = ids[order], h1[order], h2[order]
    n = len(ids)
    bnd = np.concatenate([
        [True], (np.diff(h1) != 0) | (np.diff(h2) != 0)
    ]) if n else np.empty(0, bool)
    gid = np.cumsum(bnd) - 1
    sizes = np.bincount(gid) if n else np.empty(0, np.int64)
    first = np.flatnonzero(bnd)
    return pa.table({
        id_col: pa.array(ids),
        "n_copies": pa.array(sizes[gid].astype(np.int64)),
        "is_min": pa.array(bnd),
        "multi": pa.array(sizes[gid] > 1),
    })


#: multi-member id sets up to this many rows are broadcast (ray.put of
#: an int64 array — 8 B/id); above it the flow switches to hash
#: semi/anti joins on id so NO process (driver included) ever holds the
#: duplicate-id set (VERDICT r3 item 4: a crawl corpus can be 30-50%
#: duplicates, making the broadcast O(corpus_ids) driver memory).
#: (value lives in config.EngineConfig.broadcast_id_limit with the
#: rest of the driver-reduce gate policy)
BROADCAST_ID_LIMIT = _GATES.broadcast_id_limit


def _multi_marks_ds(ds, id_col: str, text_col: str, n_shuffle_buckets: int):
    """Materialized Dataset of multi-member hash-group marks (the ids
    whose 128-bit content hash has >= 2 members).  The exchange carries
    (fold, h1, h2, id) — never text."""
    return (
        ds.map_batches(
            lambda t: tag_hash128(t, id_col, text_col, n_shuffle_buckets),
            batch_format="pyarrow",
        )
        .groupby("fold")
        .map_groups(lambda g: _hash_group_marks(g, id_col),
                    batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(t.column("multi")), batch_format="pyarrow"
        )
        .materialize()
    )


def _refold_text(t: pa.Table, id_col: str, text_col: str,
                 n_shuffle_buckets: int) -> pa.Table:
    """(id, text, fold) projection of candidate duplicate rows, fold
    keyed on the content hash so true duplicates co-group."""
    if not t.num_rows:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            text_col: pa.array([], pa.string()),
            "fold": pa.array([], pa.int64()),
        })
    h1, h2 = hashing.hash_strings128(t.column(text_col).to_pylist())
    fold = hashing.fold_pair_int64(h1, h2, n_shuffle_buckets)
    return pa.table({
        id_col: t.column(id_col).combine_chunks(),
        text_col: t.column(text_col).combine_chunks(),
        "fold": pa.array(fold),
    })


def _losers_of(dup_texts_ds, id_col: str, text_col: str):
    """Loser ids (every non-min id per identical text) from a Dataset
    of (id, text, fold) candidate rows — verified on ACTUAL text, so a
    128-bit collision can never merge two distinct texts."""

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby(text_col, sort=False)[id_col].transform("min")
        return g.loc[g[id_col] != keep, [id_col]]

    return dup_texts_ds.groupby("fold").map_groups(
        losers, batch_format="pandas"
    )


def _loser_ids(ds, id_col: str, text_col: str, n_shuffle_buckets: int,
               broadcast_id_limit: int, marks_ds=None):
    """(losers, n_multi): losers is an np.int64 array when the dup-id
    set fits the broadcast gate, else a lazily-joined Dataset of loser
    id rows (the at-scale shape — the dup-set ids never land on one
    process; the candidate texts travel a hash semi-join exchange)."""
    import ray

    if marks_ds is None:
        marks_ds = _multi_marks_ds(ds, id_col, text_col, n_shuffle_buckets)
    n_multi = marks_ds.count()
    if n_multi == 0:
        return np.empty(0, dtype=np.int64), 0
    if n_multi <= broadcast_id_limit:
        multi_ids = np.sort(np.concatenate([
            b.column(id_col).to_numpy(zero_copy_only=False)
            for b in marks_ds.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ])).astype(np.int64)
        ref = ray.put(multi_ids)

        def fetch(t: pa.Table) -> pa.Table:
            want = ray.get(ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            t = t.filter(pa.array(np.isin(ids, want)))
            return _refold_text(t, id_col, text_col, n_shuffle_buckets)

        lost = _losers_of(
            ds.map_batches(fetch, batch_format="pyarrow"), id_col, text_col
        )
        parts = [
            b for b in lost.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        if not parts:
            return np.empty(0, dtype=np.int64), n_multi
        return np.sort(
            pa.concat_tables(parts).column(id_col).to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64), n_multi
    # -- anti-join fallback (dup set too big to broadcast): candidate
    # rows selected by a hash SEMI-join on id instead of an isin against
    # a driver-collected set.  The join shuffles the (id, text)
    # projection — the documented cost of the escape hatch; the normal
    # path never ships text.
    n_cpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    proj = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    dup_texts = proj.join(
        marks_ds.select_columns([id_col]),
        join_type="left_semi",
        num_partitions=max(8, n_cpu),
        on=(id_col,),
    ).map_batches(
        lambda t: _refold_text(t, id_col, text_col, n_shuffle_buckets),
        batch_format="pyarrow",
    )
    return _losers_of(dup_texts, id_col, text_col), n_multi


def exact_drop_ids(ds, id_col: str = "doc_id", text_col: str = "text",
                   n_shuffle_buckets: int = 64,
                   broadcast_id_limit: int = BROADCAST_ID_LIMIT) -> np.ndarray:
    """Doc ids to DROP for exact dedup (keep smallest id per distinct
    text), computed with a hash-only exchange: the shuffle carries
    (fold, h1, h2, id) — never the text (the old shape made the dedup
    exchange the size of the corpus).  Only members of multi-doc hash
    groups (the duplicate set itself) are re-read WITH text through a
    pruned scan and verified per actual text, so a 128-bit collision
    can never merge two distinct texts.

    Multi-member id sets up to ``broadcast_id_limit`` are broadcast
    (they are the duplicate set, not the corpus); above it the flow
    switches to a hash semi-join on id (see :func:`_loser_ids`).  The
    return contract is an id array either way."""
    losers, _ = _loser_ids(
        ds, id_col, text_col, n_shuffle_buckets, broadcast_id_limit
    )
    if isinstance(losers, np.ndarray):
        return losers
    parts = [
        b for b in losers.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(
        pa.concat_tables(parts).column(id_col).to_numpy(zero_copy_only=False)
    ).astype(np.int64)


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text",
                n_shuffle_buckets: int = 64,
                broadcast_id_limit: int = BROADCAST_ID_LIMIT):
    """Keep the smallest-id row per distinct text — surviving rows with
    all their original columns.  The exchange carries only
    (fold, h1, h2, id) (see :func:`exact_drop_ids`); the surviving
    text is FILTERED in place per scan batch, never shuffled.  Above
    ``broadcast_id_limit`` duplicate ids, the final filter is a hash
    ANTI-join on id instead of a broadcast isin — no id set ever lands
    on one process."""
    import ray

    losers, n_multi = _loser_ids(
        ds, id_col, text_col, n_shuffle_buckets, broadcast_id_limit
    )
    if isinstance(losers, np.ndarray):
        if not len(losers):
            return ds
        ref = ray.put(losers)

        def keep_rows(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return t.filter(pa.array(~np.isin(ids, d)))

        return ds.map_batches(keep_rows, batch_format="pyarrow")
    n_cpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return ds.join(
        losers,
        join_type="left_anti",
        num_partitions=max(8, n_cpu),
        on=(id_col,),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
def minhash_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> pa.Table:
    """Batch MinHash signatures exploded to LSH band rows — fully
    vectorized: one rolling-hash pass shingles EVERY doc in the batch
    (no per-shingle Python strings), one ``reduceat`` pass per
    permutation signs them, and band keys fold across the whole
    signature matrix (`functions/hashing.py` batch kernels)."""
    rows_per_band = num_perm // bands
    n = batch.num_rows
    sh, offsets = hashing.shingle_hashes_batch(
        batch.column(text_col).to_pylist(), shingle_k
    )
    sig = hashing.minhash_signatures_batch(sh, offsets, num_perm)
    keys = hashing.lsh_band_keys_batch(sig, bands, rows_per_band)  # (n, bands)
    doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.Table.from_pydict(
        {
            id_col: pa.array(np.repeat(doc_ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(keys.reshape(-1)),
        }
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    return hashing.jaccard(set(hashing.shingles(a, k)), set(hashing.shingles(b, k)))


def _bucket_pair_indices(starts: np.ndarray, ends: np.ndarray,
                         mega_cap: int | None = None):
    """(ii, jj) row-index arrays pairing every bucket's rows, shared by
    the MinHash / SimHash / n-gram kernels: all-pairs (cached triu)
    for buckets of size <= ``mega_cap``, sorted-order CHAIN
    (row_i, row_{i+1}) for larger ones — true dup groups stay connected
    through the chain (the components pass merges them) and every
    emitted pair is still verified downstream.  ``mega_cap=None``
    means NO cap (all-pairs always) — required where the candidate set
    must be provably complete (the exact n-gram PPJoin).  Rows must
    arrive sorted by id WITHIN each bucket so chains are deterministic
    and ii < jj implies id_i < id_j."""
    sizes = ends - starts
    ii_all: list = []
    jj_all: list = []
    if mega_cap is not None:
        mega = sizes > mega_cap
        for s, e in zip(starts[mega], ends[mega]):
            ii_all.append(np.arange(s, e - 1))
            jj_all.append(np.arange(s + 1, e))
        small = (sizes >= 2) & ~mega
    else:
        small = sizes >= 2
    triu_cache: dict = {}
    for s, e in zip(starts[small], ends[small]):
        n = e - s
        iu = triu_cache.get(n)
        if iu is None:
            iu = triu_cache[n] = np.triu_indices(n, k=1)
        ii_all.append(s + iu[0])
        jj_all.append(s + iu[1])
    if not ii_all:
        z = np.array([], dtype=np.int64)
        return z, z
    return np.concatenate(ii_all), np.concatenate(jj_all)


def minhash_candidate_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    n_shuffle_buckets: int = 64,
):
    """docs Dataset -> candidate near-dup pairs Dataset
    (id_a < id_b, distinct).

    The LSH bucket shuffle groups on a COARSE key — a stable hash of
    (band, band_hash) folded into ``n_shuffle_buckets`` — not on the
    raw bucket: a corpus yields ~rows/2 distinct (band, band_hash)
    buckets, and per-group callbacks at that granularity pay a Python
    slice+call per TINY group (measured 4.6 s of the 7 s candidate
    stage at 80k sig rows).  Folding keeps every bucket intact inside
    exactly one group while the per-group kernel walks bucket
    boundaries with one lexsort + numpy slicing.  Size
    ``n_shuffle_buckets`` ~ O(cluster cores): groups stay balanced
    (the key is a hash) and each holds ~rows/buckets sig rows."""

    def batch_sigs(t: pa.Table) -> pa.Table:
        out = minhash_batch(t, id_col, text_col, num_perm, bands, shingle_k)
        fold = hashing.fold_pair_int64(
            out.column("band").to_numpy(zero_copy_only=False),
            out.column("band_hash").to_numpy(zero_copy_only=False),
            n_shuffle_buckets,
        )
        return out.append_column("bucket", pa.array(fold))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = g["band"].to_numpy().astype(np.int64)
        h = g["band_hash"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, h, b))
        b, h, ids = b[order], h[order], ids[order]
        new = np.ones(len(b), dtype=bool)
        new[1:] = (b[1:] != b[:-1]) | (h[1:] != h[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(b))
        # mega-bucket (>200): chain instead of dropping — recall loss
        # is only for dissimilar docs sharing the bucket, which
        # verification would have rejected anyway
        ii, jj = _bucket_pair_indices(starts, ends, mega_cap=200)
        # duplicate doc_id rows in the input can co-bucket a row with
        # itself; jaccard(a,a)=1.0 would pass any threshold downstream
        # (verify_pairs_distributed does not filter id_a == id_b)
        keep = ids[ii] != ids[jj]
        ii, jj = ii[keep], jj[keep]
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    return (
        ds.map_batches(batch_sigs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def verify_pairs(
    pairs_df: pd.DataFrame, texts: dict, threshold: float = 0.8, k: int = 5
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs against an
    in-memory text lookup.  SMALL-INPUT path only (tests / driver-sized
    candidate sets) — the corpus-scale path is
    :func:`verify_pairs_distributed`, which joins the pairs back to the
    documents Dataset instead of materializing texts."""
    if not len(pairs_df):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    pairs_df = pairs_df.drop_duplicates(subset=["id_a", "id_b"])
    # shingle each doc ONCE (a doc appears in many candidate pairs;
    # re-shingling per pair dominated the verify cost)
    sets: dict = {}

    def sset(i):
        s = sets.get(i)
        if s is None:
            s = sets[i] = set(hashing.shingles(texts[i], k))
        return s

    sims = [
        hashing.jaccard(sset(a), sset(b))
        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"])
    ]
    out = pairs_df.assign(jaccard=sims)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


#: popcount lookup table for the bitmap verify fast path
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

#: per-worker verifier cache (see _worker_verifier)
_VERIFIER_CACHE: dict = {}


def _worker_verifier(dref, threshold: float, k: int):
    """Process-level cache of :class:`_BroadcastVerifier` keyed by the
    broadcast ObjectRef: Ray reuses worker processes across the tasks
    of a map_batches stage, so the expensive per-corpus setup runs
    once per worker without paying actor-pool spin-up."""
    key = (dref.hex(), float(threshold), int(k))
    v = _VERIFIER_CACHE.get(key)
    if v is None:
        if len(_VERIFIER_CACHE) >= 4:  # bound worker memory
            _VERIFIER_CACHE.pop(next(iter(_VERIFIER_CACHE)))
        v = _VERIFIER_CACHE[key] = _BroadcastVerifier(dref, threshold, k)
    return v
#: bitmap index budget: distinct_shingles x n_docs bits (256 MB)
_BITMAP_BUDGET_BITS = 1 << 31


class _BroadcastVerifier:
    """Actor-pool exact-Jaccard scorer against a broadcast doc table.

    ``__init__`` (once per actor, the stateful-stage contract) shingles
    every broadcast doc ONCE and — when the corpus' distinct-shingle
    dictionary is small enough (distinct x docs bits within
    ``_BITMAP_BUDGET_BITS``, the dense-corpus case where candidate
    sets are pairs-quadratic) — builds an EXACT bitmap index: one bit
    per distinct shingle STRING (no hashing, so no collision caveat),
    one packed row per doc.  ``__call__`` then scores a whole batch of
    candidate pairs with one vectorized AND + popcount-LUT pass
    (intersection counts, hence Jaccard values, are bit-identical to
    the set-based kernel — a pytest pins equality).  Sparse corpora
    (big dictionary) keep the per-doc set cache, which now ALSO
    persists across batches instead of being rebuilt per batch."""

    def __init__(self, dref, threshold: float, k: int):
        import ray

        self.threshold = threshold
        self.k = k
        self.sids, self.stexts = ray.get(dref)
        sets = [set(hashing.shingles(t, k)) for t in self.stexts]
        self.sizes = np.fromiter((len(s) for s in sets), dtype=np.int64,
                                 count=len(sets))
        vocab: dict[str, int] = {}
        for s in sets:
            for sh in s:
                if sh not in vocab:
                    vocab[sh] = len(vocab)
        n_docs, n_bits = len(sets), len(vocab)
        if n_docs * n_bits <= _BITMAP_BUDGET_BITS:
            nbytes = (n_bits + 7) // 8
            bm = np.zeros((n_docs, nbytes), dtype=np.uint8)
            for i, s in enumerate(sets):
                idx = np.fromiter((vocab[sh] for sh in s), dtype=np.int64,
                                  count=len(s))
                np.bitwise_or.at(bm[i], idx >> 3,
                                 np.uint8(1) << (idx & 7).astype(np.uint8))
            self.bitmaps = bm
            self.sets = None
        else:
            self.bitmaps = None
            self.sets = sets

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        pa_i = np.searchsorted(self.sids, a)
        pb_i = np.searchsorted(self.sids, b)
        if self.bitmaps is not None:
            inter = np.empty(len(a), dtype=np.int64)
            # chunk size derives from the ROW WIDTH: the budget bounds
            # n_docs*n_bits, not nbytes, so a small dense corpus can
            # have wide rows (1000 docs x 2M shingles = 262 KB/doc) —
            # a fixed 65536-pair chunk would allocate CH x nbytes
            # (~17 GB there).  Target ~32 MB of AND-buffer instead.
            nbytes = self.bitmaps.shape[1]
            CH = max(1, (32 << 20) // max(nbytes, 1))
            if hasattr(np, "bitwise_count"):  # numpy >= 2
                def _pop(band):
                    return np.bitwise_count(band).sum(
                        axis=1, dtype=np.int64)
            else:
                def _pop(band):
                    # accumulate per-column popcount lookups; never
                    # materializes the full uint16 LUT-expanded array
                    acc = np.zeros(band.shape[0], dtype=np.int64)
                    COLS = 1 << 16
                    for cs in range(0, band.shape[1], COLS):
                        acc += _POP8[band[:, cs:cs + COLS]].sum(
                            axis=1, dtype=np.int64)
                    return acc
            for s in range(0, len(a), CH):
                e = min(s + CH, len(a))
                band = self.bitmaps[pa_i[s:e]] & self.bitmaps[pb_i[s:e]]
                inter[s:e] = _pop(band)
            na, nb = self.sizes[pa_i], self.sizes[pb_i]
            union = na + nb - inter
            sims = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        else:
            sims = np.fromiter(
                (hashing.jaccard(self.sets[int(i)], self.sets[int(j)])
                 for i, j in zip(pa_i, pb_i)),
                np.float64, t.num_rows,
            )
        keep = sims >= self.threshold
        out = t.select(["id_a", "id_b"]).append_column(
            "jaccard", pa.array(sims, type=pa.float64())
        )
        return out.filter(pa.array(keep))


def verify_pairs_distributed(
    pairs_ds,
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 5,
    sig_prefilter: bool = False,
    num_perm: int = 64,
    broadcast_docs_max: int = _GATES.broadcast_docs_max,
):
    """Corpus-scale pair verification: candidate pairs hash-join back to
    the documents Dataset TWICE (id_a side, id_b side), then the exact
    n-gram Jaccard runs inside map_batches — the corpus text is never
    materialized on the driver.

    ``sig_prefilter=True`` inserts a MinHash-signature screen BEFORE
    the text joins: pairs join twice against a (doc_id, packed sig)
    projection (~512 B/doc instead of the full text), estimated
    Jaccard = mean equal components, and only pairs with estimate >=
    threshold - 0.3 proceed to exact text verification.  On a
    dup-heavy corpus the text joins are the dominant cost (2 x text
    bytes PER CANDIDATE through the shuffle); the screen cuts them to
    the near-accepted subset.  P(estimate < t-0.3 | true >= t) with 64
    permutations is ~1e-9 per pair — a deterministic, documented
    approximation; leave it off where the candidate set must be
    verified exactly as given.

    Returns a Dataset of (id_a, id_b, jaccard) rows meeting the
    threshold, deduplicated on (id_a, id_b)."""

    # coarse-key dedup (same trick as minhash_candidate_pairs): a
    # per-(id_a,id_b) map_groups pays a Python call per candidate pair;
    # grouping on a folded hash co-locates duplicates while one
    # vectorized drop_duplicates per group does the work.
    def _with_fold(t: pa.Table) -> pa.Table:
        fold = hashing.fold_pair_int64(
            t.column("id_a").to_numpy(zero_copy_only=False),
            t.column("id_b").to_numpy(zero_copy_only=False),
        )
        return t.append_column("fold", pa.array(fold))

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["fold"])

    pairs = (
        pairs_ds.map_batches(_with_fold, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(dedup_group, batch_format="pandas")
    )

    # --- broadcast gate (the broadcast_node_rows discipline): below
    # the gate the verification joins disappear entirely — the doc
    # table broadcasts ONCE via ray.put and every pair batch scores
    # against it with a per-batch shingle-set cache.  The candidate
    # set of an exact similarity join is pairs-quadratic in the dense
    # case while the doc table stays linear, so shipping texts per
    # CANDIDATE through two hash joins (the scale path above the
    # gate) costs |pairs|·|text| where the broadcast costs |docs|
    # once per actor: measured 23 s -> ~3 s at sf0.1 (1.5M candidate
    # pairs over a 1.4 MB doc table).  Count is metadata-cheap for
    # parquet-backed datasets.
    # an explicit sig_prefilter request keeps the join path — the
    # screen exists to be exercised (its scale story is the join path)
    n_docs = docs_ds.count()
    if n_docs <= broadcast_docs_max and not sig_prefilter:
        import ray

        dt = pa.concat_tables(
            [b for b in docs_ds.select_columns([id_col, text_col])
             .iter_batches(batch_format="pyarrow")]
        )
        ids_all = dt.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(ids_all, kind="stable")
        texts_all = dt.column(text_col).to_numpy(
            zero_copy_only=False
        ).astype(object)[order]
        dref = ray.put((ids_all[order], texts_all))

        # task pool + per-WORKER verifier cache: the corpus shingling
        # (and, on a dense corpus, the exact bitmap index) happens once
        # per worker process — amortized like an actor __init__ — while
        # keeping the task pool's zero spin-up (the brute_force_topk
        # lesson: an actor pool pays ~2 s of ramp this stage can't
        # amortize at battery scale)
        def score_broadcast(t: pa.Table) -> pa.Table:
            return _worker_verifier(dref, threshold, k)(t)

        return pairs.map_batches(score_broadcast, batch_format="pyarrow")

    if sig_prefilter:
        margin = max(0.0, threshold - 0.3)

        sig_width = 8 * num_perm

        def sig_proj(side: str):
            def f(t: pa.Table) -> pa.Table:
                ids = t.column(id_col).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                sh, off = hashing.shingle_hashes_batch(
                    t.column(text_col).to_pylist(), k
                )
                sig = hashing.minhash_signatures_batch(sh, off, num_perm)
                # FIXED-size binary: the whole column is one flat
                # buffer, so the screen reads it zero-copy (variable
                # binary would force per-value Python bytes objects)
                return pa.Table.from_pydict(
                    {f"id_{side}": pa.array(ids),
                     f"sig_{side}": pa.FixedSizeBinaryArray.from_buffers(
                         pa.binary(sig_width), len(ids),
                         [None, pa.py_buffer(np.ascontiguousarray(sig)
                                             .tobytes())])}
                )

            return f

        def _sig_matrix(col: pa.ChunkedArray) -> np.ndarray:
            arr = col.combine_chunks()
            buf = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
            start = arr.offset * num_perm
            return buf[start : start + len(arr) * num_perm].reshape(
                len(arr), num_perm
            )

        sa = docs_ds.map_batches(sig_proj("a"), batch_format="pyarrow")
        sb = docs_ds.map_batches(sig_proj("b"), batch_format="pyarrow")
        sj = sa.join(pairs, join_type="inner", num_partitions=4, on=("id_a",))
        sj = sb.join(sj, join_type="inner", num_partitions=4, on=("id_b",))

        def screen(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.select(["id_a", "id_b"])
            est = (
                _sig_matrix(t.column("sig_a")) == _sig_matrix(t.column("sig_b"))
            ).mean(axis=1)
            return t.select(["id_a", "id_b"]).filter(pa.array(est >= margin))

        pairs = sj.map_batches(screen, batch_format="pyarrow")

    docs_a = docs_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id_a": t.column(id_col), "text_a": t.column(text_col)}
        ),
        batch_format="pyarrow",
    )
    docs_b = docs_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id_b": t.column(id_col), "text_b": t.column(text_col)}
        ),
        batch_format="pyarrow",
    )
    # join the DENSE side first (docs) to keep hash partitions non-empty
    j = docs_a.join(pairs, join_type="inner", num_partitions=4, on=("id_a",))
    j = docs_b.join(j, join_type="inner", num_partitions=4, on=("id_b",))

    def score(t: pa.Table) -> pa.Table:
        # per-batch shingle-set cache: a doc recurs across its pairs
        sets: dict = {}

        def sset(txt):
            s = sets.get(txt)
            if s is None:
                s = sets[txt] = set(hashing.shingles(txt, k))
            return s

        sims = np.fromiter(
            (
                hashing.jaccard(sset(a), sset(b))
                for a, b in zip(
                    t.column("text_a").to_pylist(), t.column("text_b").to_pylist()
                )
            ),
            np.float64,
            t.num_rows,
        )
        keep = sims >= threshold
        t = t.select(["id_a", "id_b"]).append_column(
            "jaccard", pa.array(sims, type=pa.float64())
        )
        return t.filter(pa.array(keep))

    return j.map_batches(score, batch_format="pyarrow")


def connected_components_distributed(
    pairs_ds, max_rounds: int = 50, num_partitions: int = 4
):
    """Min-label propagation as RAY rounds: each round is a hash join
    (edges ⋈ labels on v) + a groupby-min shuffle — the dup graph never
    sits on the driver.  Exact same result as the pandas variant (a
    pytest asserts equality); use when the edge set outgrows a single
    process.  Converges in O(diameter) rounds."""
    import ray.data as rd
    from ray.data.aggregate import Min

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks().cast(pa.int64())
        b = t.column("id_b").combine_chunks().cast(pa.int64())
        return pa.Table.from_pydict(
            {
                "u": pa.concat_arrays([a, b]),
                "v": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "component": pa.array([], type=pa.int64())})
        )
    # initial label(u) = min(u, min neighbor)
    labels = (
        edges.groupby("u")
        .aggregate(Min("v", alias_name="label"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("label"),
                "label",
                pa.array(
                    np.minimum(
                        t.column("u").to_numpy(zero_copy_only=False),
                        t.column("label").to_numpy(zero_copy_only=False),
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    for _ in range(max_rounds):
        # propagate: for each edge (u,v), candidate label(u) = label(v)
        prop = (
            edges.join(
                labels.map_batches(
                    lambda t: t.rename_columns(["v", "lv"]), batch_format="pyarrow"
                ),
                join_type="inner", num_partitions=num_partitions, on=("v",),
            )
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"u": t.column("u"), "label": t.column("lv")}
                ),
                batch_format="pyarrow",
            )
        )
        new_labels = (
            prop.union(labels)
            .groupby("u")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # pointer jumping: l(u) <- min(l(u), l(l(u))) — one extra join
        # per round turns diameter-round convergence into O(log n)
        as_key = new_labels.map_batches(
            lambda t: t.rename_columns(["lkey", "lval"]), batch_format="pyarrow"
        )
        jumped = (
            new_labels.map_batches(
                lambda t: t.rename_columns(["u", "lkey"]), batch_format="pyarrow"
            )
            .join(as_key, join_type="inner", num_partitions=num_partitions, on=("lkey",))
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"u": t.column("u"), "label": t.column("lval")}
                ),
                batch_format="pyarrow",
            )
        )
        new_labels = (
            jumped.union(new_labels.select_columns(["u", "label"]))
            .groupby("u")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # converged when no label changed: labels only ever decrease
        # under min-propagation, so an unchanged sum means a fixpoint
        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow",
    )


def connected_components(pairs_df: pd.DataFrame, max_rounds: int = 20) -> pd.DataFrame:
    """Min-label propagation over the dup graph -> (doc_id, component).
    DRIVER-sized variant (candidate graphs after LSH are delta-sized);
    the corpus-scale path is :func:`connected_components_distributed`
    (same algorithm as Ray join+groupby rounds, equality-tested)."""
    if not len(pairs_df):
        return pd.DataFrame({"doc_id": [], "component": []})
    edges = pd.concat(
        [
            pairs_df.rename(columns={"id_a": "u", "id_b": "v"})[["u", "v"]],
            pairs_df.rename(columns={"id_a": "v", "id_b": "u"})[["u", "v"]],
        ]
    )
    label = pd.Series(
        index=np.unique(edges[["u", "v"]].to_numpy().ravel()), dtype=np.int64
    )
    label[:] = label.index
    for _ in range(max_rounds):
        prop = edges.assign(lv=label.loc[edges["v"].to_numpy()].to_numpy())
        new = prop.groupby("u")["lv"].min()
        merged = np.minimum(label.loc[new.index].to_numpy(), new.to_numpy())
        changed = (merged != label.loc[new.index].to_numpy()).any()
        label.loc[new.index] = merged
        # pointer jumping (label(u) <- label(label(u))): without it a
        # path graph needs DIAMETER rounds; with it, O(log n)
        for _ in range(64):
            nxt = label.loc[label.to_numpy()].to_numpy()
            if (nxt == label.to_numpy()).all():
                break
            label[:] = np.minimum(label.to_numpy(), nxt)
        if not changed:
            break
    return pd.DataFrame(
        {
            "doc_id": label.index.to_numpy().astype(np.int64),
            "component": label.to_numpy().astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Batch SimHash: ONE ``hash_strings_poly`` call over every token
    of every doc (the SQL-mirrorable hash — the simhash battery entry
    is oracle-gated by a DuckDB mirror of the bit-vote computation),
    bit votes folded per doc with ``add.reduceat`` — no per-doc
    hashing loop (same bit definition as ``hashing.simhash64``)."""
    tok_lists = [t.lower().split() for t in batch.column(text_col).to_pylist()]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    n = len(counts)
    sigs = np.zeros(n, dtype=np.uint64)
    flat = [tok for toks in tok_lists for tok in toks]
    if flat:
        h = hashing.hash_strings_poly(flat).view(np.uint64)
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int32)
        # reduceat over NON-EMPTY docs only (strictly increasing starts;
        # empty docs keep signature 0)
        ne = np.flatnonzero(counts > 0)
        ne_counts = counts[ne]
        starts = np.zeros(len(ne), dtype=np.int64)
        np.cumsum(ne_counts[:-1], out=starts[1:])
        votes = np.add.reduceat(bits, starts, axis=0)
        word = (votes * 2 > ne_counts[:, None]).astype(np.uint64)
        sigs[ne] = (word << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    return pa.Table.from_pydict(
        {
            id_col: batch.column(id_col),
            "simhash": pa.array(sigs.view(np.int64), type=pa.int64()),
        }
    )


def simhash_near_dups(ds, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket on each of the four 16-bit
    sub-bands (a pair within hamming<=3 shares at least one band),
    verify hamming inside the bucket."""

    def sigs(t: pa.Table) -> pa.Table:
        return simhash_batch(t, id_col, text_col)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band = np.repeat(np.arange(4, dtype=np.int64), n)
        key = np.concatenate(
            [((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
             for b in range(4)]
        )
        # coarse-fold shuffle key (see minhash_candidate_pairs): one
        # (band, key) bucket per distinct sub-band value would pay a
        # Python call per tiny group
        fold = hashing.fold_pair_int64(band, key)
        return pa.Table.from_pydict(
            {id_col: pa.array(np.tile(ids, 4)),
             "band": pa.array(band), "key": pa.array(key),
             "simhash": pa.array(np.tile(sh.view(np.int64), 4)),
             "fold": pa.array(fold.astype(np.int64))}
        )

    def _ham(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x = (a.view(np.uint64) ^ b.view(np.uint64)).view(np.uint64)
        return np.unpackbits(
            x[:, None].view(np.uint8), axis=1
        ).sum(axis=1).astype(np.int64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.array([], dtype=np.int64),
             "id_b": np.array([], dtype=np.int64),
             "hamming": np.array([], dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        band = g["band"].to_numpy().astype(np.int64)
        key = g["key"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        sh = g["simhash"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, key, band))
        band, key, ids, sh = band[order], key[order], ids[order], sh[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ids))
        # mega-bucket (>500): chain-pair by sorted id instead of
        # silently dropping; hamming still verified below
        ii, jj = _bucket_pair_indices(starts, ends, mega_cap=500)
        if not len(ii):
            return empty
        h = _ham(sh[ii], sh[jj])  # one vectorized XOR+popcount pass
        keep = (h <= max_hamming) & (ids[ii] != ids[jj])
        return pd.DataFrame(
            {"id_a": np.minimum(ids[ii][keep], ids[jj][keep]),
             "id_b": np.maximum(ids[ii][keep], ids[jj][keep]),
             "hamming": h[keep]}
        )

    return (
        ds.map_batches(sigs, batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join (AllPairs/PPJoin-style)
# ---------------------------------------------------------------------------
def _shingle_prefix_rows(
    batch: pa.Table,
    hot_df: dict,
    id_col: str,
    text_col: str,
    threshold: float,
    k: int,
) -> pa.Table:
    """Per-doc prefix rows (sh, doc_id, pos, size) under the global
    shingle order (df, hash64, sh).  `hot_df` holds document
    frequencies only for FREQUENT shingles, keyed by the 64-bit
    shingle hash (everything absent counts as df=1) — the order stays
    a pure function of the shingle, so prefix-filter completeness
    holds, while the broadcast dict stays bounded
    (|dict| <= total shingle rows / df_floor)."""
    import math

    out_sh: list[str] = []
    out_id: list[int] = []
    out_pos: list[int] = []
    out_size: list[int] = []
    for did, text in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        s = sorted(set(hashing.shingles(text, k)))  # string tie-break
        hs = hashing.hash_strings(s)
        # vectorized (df, hash) order over the string-sorted base: the
        # stable lexsort inherits the string tie-break without building
        # a Python tuple key per shingle (hash keyed df — a 64-bit
        # collision only SHARES a df between two shingles, the order
        # stays a pure total function of the shingle)
        dfv = np.fromiter(
            (hot_df.get(int(h), 1) for h in hs), np.int64, len(s)
        )
        order = np.lexsort((hs, dfv))
        n = len(s)
        plen = max(n - math.ceil(threshold * n) + 1, 1)
        out_sh.extend(s[int(i)] for i in order[:plen])
        out_id.extend([did] * plen)
        out_pos.extend(range(plen))
        out_size.extend([n] * plen)
    return pa.Table.from_pydict(
        {
            "sh": pa.array(out_sh, type=pa.string()),
            id_col: pa.array(out_id, type=pa.int64()),
            "pos": pa.array(out_pos, type=pa.int32()),
            "size": pa.array(out_size, type=pa.int32()),
        }
    )


def ngram_jaccard_pairs(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 5,
    hot_df_floor: int = 2,
    hot_df_cap: int | None = None,
):
    """EXACT n-gram-Jaccard similarity join: every pair with
    Jaccard(shingles_k(a), shingles_k(b)) >= threshold, no
    approximation (unlike MinHash, which is probabilistic).

    Scale shape (AllPairs/PPJoin over Ray Data):
      1. df pass: shingle explode -> groupby count; only shingles with
         df >= hot_df_floor are broadcast (ray.put) — the frequent
         tail is what must sort LAST in prefixes, rare dfs don't
         matter for candidate quality and default to 1.  The dict is
         additionally CAPPED at the top ``hot_df_cap`` shingles by df
         (default ``EngineConfig.ppjoin_hot_df_cap``): on a crawl-
         scale corpus nearly every shingle has df >= 2, so an uncapped
         dict is O(corpus vocabulary) per worker.  Capping preserves
         exactness — prefix-filter completeness only needs the order
         to be a pure total function of the shingle, and
         (df-or-default-1, hash, sh) is one at ANY cap.
      2. prefix emission: each doc indexes only its first
         n - ceil(t*n) + 1 shingles under the global (df, hash, sh)
         order.  Lemma: if |A∩B| >= ceil(t*|A|) the smallest common
         shingle lies in both prefixes — no qualifying pair is missed.
      3. bucket groupby on the shingle: candidate pairs filtered by
         the exact length bound (t*max(|A|,|B|) <= min(|A|,|B|)) and
         the PPJoin positional bound
         (1 + min(|A|-pa-1, |B|-pb-1) >= ceil(t/(1+t)*(|A|+|B|))).
      4. verification: pairs join back to the documents Dataset
         (verify_pairs_distributed) — true Jaccard, never the corpus
         on the driver.

    Returns Dataset[(id_a, id_b, jaccard)] with id_a < id_b.
    """
    import math

    import ray
    from ray.data.aggregate import Count

    def explode_partial(t: pa.Table) -> pa.Table:
        # the df exchange carries the 64-bit shingle HASH, never the
        # string (int shuffle + int groupby; a collision only merges
        # two shingles' dfs — the prefix order stays a pure total
        # function of the shingle, so PPJoin completeness holds).
        # MAP-SIDE COMBINED: each block emits one (hash, count) row
        # per distinct shingle — the partial stream is vocab-per-block
        # sized, never corpus-sized
        sh_out: list[str] = []
        for text in t.column(text_col).to_pylist():
            sh_out.extend(set(hashing.shingles(text, k)))
        u, c = np.unique(hashing.hash_strings(sh_out), return_counts=True)
        return pa.Table.from_pydict(
            {"sh_h": pa.array(u), "c": pa.array(c.astype(np.int64))}
        )

    # df reduce shape chosen by the EXACT partial-row count (the
    # kmeans-partials precedent, commit d2991fc): below the gate the
    # tiny per-block vocab partials fold on the driver — one pandas
    # groupby instead of a full AllToAll ramp (~4 s of the join's
    # wall-time at bench scale); above it (big vocabulary x many
    # blocks) the Ray groupby-sum shuffle does the fold.  Both compute
    # the same exact df.
    if hot_df_cap is None:
        hot_df_cap = _GATES.ppjoin_hot_df_cap
    partials = docs_ds.map_batches(
        explode_partial, batch_format="pyarrow"
    ).materialize()
    if partials.count() <= _GATES.driver_partials_max:
        pdf = partials.to_pandas()
        agg = pdf.groupby("sh_h", as_index=False)["c"].sum()
        hot = agg[agg["c"] >= int(hot_df_floor)].rename(
            columns={"c": "df"})
        if len(hot) > hot_df_cap:
            # deterministic top-M: df desc, hash asc tie-break
            hot = hot.sort_values(
                ["df", "sh_h"], ascending=[False, True]
            ).head(hot_df_cap)
    else:
        from ray.data.aggregate import Sum

        hot_ds = (
            partials.groupby("sh_h")
            .aggregate(Sum("c", alias_name="df"))
            .filter(expr=f"df >= {int(hot_df_floor)}")
        )
        # top-M selected DISTRIBUTED (sort+limit) — only the capped
        # dict ever reaches the driver, never the full vocabulary
        hot = (
            hot_ds.sort(["df", "sh_h"], descending=[True, False])
            .limit(hot_df_cap)
            .to_pandas()
        )
    hot_df = dict(zip(hot["sh_h"].astype(int), hot["df"].astype(int)))
    hot_ref = ray.put(hot_df)

    def prefixes(t: pa.Table) -> pa.Table:
        return _shingle_prefix_rows(
            t, ray.get(hot_ref), id_col, text_col, threshold, k
        )

    def tag_fold(t: pa.Table) -> pa.Table:
        # coarse-fold shuffle (see minhash_candidate_pairs): shingle
        # buckets have per-row cardinality; fold keeps each bucket
        # intact in one group while the kernel walks bucket boundaries
        fold = (
            hashing.hash_strings(t.column("sh").to_pylist()).view(np.uint64)
            % np.uint64(64)
        ).astype(np.int64)
        return t.append_column("fold", pa.array(fold))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.array([], dtype=np.int64),
             "id_b": np.array([], dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        sh = g["sh"].to_numpy()
        ids_all = g[id_col].to_numpy()
        pos_all = g["pos"].to_numpy()
        size_all = g["size"].to_numpy()
        order = np.lexsort((ids_all, sh))
        sh, ids_all = sh[order], ids_all[order]
        pos_all, size_all = pos_all[order], size_all[order]
        new = np.ones(len(sh), dtype=bool)
        new[1:] = sh[1:] != sh[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(sh))
        # NO mega cap here: this join is contractually EXACT (the
        # PPJoin lemma needs every prefix-bucket pair examined).  The
        # size/positional filters run PER BUCKET so peak memory is one
        # bucket's triu + the accumulated SURVIVORS — never the fold
        # group's total unfiltered pairs (a hot-shingle bucket times
        # many buckets would otherwise sit live at once).
        out_a: list = []
        out_b: list = []
        triu_cache: dict = {}
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            iu = triu_cache.get(n)
            if iu is None:
                iu = triu_cache[n] = np.triu_indices(n, k=1)
            ii, jj = s + iu[0], s + iu[1]
            na, nb = size_all[ii], size_all[jj]
            pa_, pb_ = pos_all[ii], pos_all[jj]
            keep = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
            alpha = np.ceil(threshold / (1.0 + threshold) * (na + nb))
            keep &= 1 + np.minimum(na - pa_ - 1, nb - pb_ - 1) >= alpha
            keep &= ids_all[ii] != ids_all[jj]
            out_a.append(np.minimum(ids_all[ii][keep], ids_all[jj][keep]))
            out_b.append(np.maximum(ids_all[ii][keep], ids_all[jj][keep]))
        if not out_a:
            return empty
        a = np.concatenate(out_a).astype(np.int64)
        b = np.concatenate(out_b).astype(np.int64)
        # within-group dedup: a pair recurs once per shared prefix
        # shingle that lands in THIS fold (true near-dups share ~50,
        # so several collide per fold); cross-fold repeats remain for
        # verify_pairs_distributed's global dedup
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return pd.DataFrame({"id_a": uniq[:, 0], "id_b": uniq[:, 1]})

    cand = (
        docs_ds.map_batches(prefixes, batch_format="pyarrow")
        .map_batches(tag_fold, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return verify_pairs_distributed(
        cand, docs_ds, id_col=id_col, text_col=text_col, threshold=threshold, k=k
    )


# ---------------------------------------------------------------------------
# incremental dedup against persisted state (the 100-TB operating shape:
# dedup a NEW ingest window against everything accepted so far WITHOUT
# scanning the accepted corpus — only a hash-partitioned fingerprint
# index is consulted, and each window shard touches exactly one part)
# ---------------------------------------------------------------------------
N_INDEX_PARTS = 64


def _fingerprint_and_part(
    t: pa.Table, text_col: str, n_parts: int
) -> pa.Table:
    """64-bit content fingerprint + its index partition.

    The index stores fingerprints, not text (at corpus scale the text
    must not travel); a 64-bit collision merging two distinct documents
    has probability ~n^2/2^65 — the documented trade of every
    production-scale dedup index (vs the in-window byte verification
    `dedup_exact` can afford because the colliding texts are co-grouped
    there anyway)."""
    fp = hashing.hash_strings(t.column(text_col).to_pylist())
    part = (fp.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
    return t.append_column("fp", pa.array(fp)).append_column(
        "part", pa.array(part)
    )


def build_hash_index(
    ds, index_dir: str, text_col: str = "text", n_parts: int = N_INDEX_PARTS
) -> None:
    """Materialize the fingerprint index for an accepted corpus:
    one hive directory per ``part`` (``part=K/*.parquet``), each file
    holding only int64 ``fp`` rows.  Streaming write — the corpus is
    never collected."""

    def proj(t: pa.Table) -> pa.Table:
        t = _fingerprint_and_part(t, text_col, n_parts)
        return t.select(["fp", "part"])

    ds.map_batches(proj, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["part"]
    )
    # Bloom sidecars (read-skip accelerant, see _bloom_path): built
    # AFTER the part files from their on-disk contents; a missing
    # sidecar just means "must read the shard", so a crash here only
    # loses the skip, never correctness
    from concurrent.futures import ThreadPoolExecutor

    def _mk(part: int) -> None:
        keys = _read_index_part(index_dir, part)
        if len(keys):
            _write_bloom(index_dir, part, bloom.build(keys))

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(_mk, range(n_parts)))


def _bloom_path(index_dir: str, part: int) -> str:
    return f"{index_dir}/part={part}/_bloom.npy"


def _write_bloom(index_dir: str, part: int, bits: np.ndarray) -> None:
    import os as _os

    path = _bloom_path(index_dir, part)
    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    np.save(path + ".tmp", bits)  # np.save appends .npy
    _os.replace(path + ".tmp.npy", path)


def _read_bloom(index_dir: str, part: int):
    import os as _os

    path = _bloom_path(index_dir, part)
    if not _os.path.exists(path):
        return None
    return np.load(path)


def _read_index_part(index_dir: str, part: int) -> np.ndarray:
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{index_dir}/part={part}/*.parquet"))
    if not files:
        return np.empty(0, dtype=np.int64)
    arrs = [
        pq.read_table(f, columns=["fp"]).column("fp").to_numpy(
            zero_copy_only=False
        )
        for f in files
    ]
    return np.sort(np.concatenate(arrs))


def incremental_dedup(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = N_INDEX_PARTS,
):
    """Survivors of a new window vs the persisted index AND vs itself.

    Shape: fingerprint+part per batch -> groupby(part) -> each group
    reads ONLY its own index shard (sorted-array membership via
    searchsorted) and keeps the smallest-id row per unseen fingerprint.
    All rows of one fingerprint land in one part, so the in-window
    dedup is globally exact; the exchange is one shuffle keyed on
    ``part``; no task ever sees more than one index shard."""

    def check(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        fp = g["fp"].to_numpy()
        bits = _read_bloom(index_dir, part)
        if bits is not None and not bloom.might_contain(bits, fp).any():
            # Bloom says NO probe can hit this shard: every row is
            # fresh vs the index — skip the shard read entirely (no
            # false negatives, so this skip is exact); in-window dedup
            # below still applies
            g = g.sort_values(id_col, kind="stable")
            return g.drop_duplicates(subset=["fp"], keep="first")
        idx = _read_index_part(index_dir, part)
        if len(idx):
            pos = np.clip(np.searchsorted(idx, fp), 0, len(idx) - 1)
            fresh = idx[pos] != fp
        else:
            fresh = np.ones(len(g), dtype=bool)
        g = g.loc[fresh].sort_values(id_col, kind="stable")
        return g.drop_duplicates(subset=["fp"], keep="first")

    return (
        ds.map_batches(
            lambda t: _fingerprint_and_part(t, text_col, n_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(check, batch_format="pandas")
    )


def update_hash_index(survivors, index_dir: str, n_parts: int = N_INDEX_PARTS):
    """Append the accepted window's fingerprints to the index (the
    state advance of the ingest loop).  Appends are new files per part
    directory; replaying a window adds only duplicate fingerprints,
    which membership semantics ignore — so a crashed-and-retried
    window is harmless (idempotent for correctness, not for bytes)."""
    surv = survivors.select_columns(["fp", "part"]).materialize()
    # Bloom sidecars update FIRST (OR-in the new keys at the existing
    # bit width), THEN the part files append: a crash in between
    # leaves bits for keys not yet on disk — false POSITIVES only
    # (harmless extra reads); the reverse order could leave appended
    # keys missing from the Bloom, and a Bloom false negative would
    # break exactness.  Same sigs-before-bands discipline as the
    # near-dup index.
    parts = surv.to_pandas()
    for part, grp in parts.groupby("part", sort=False):
        bits = _read_bloom(index_dir, int(part))
        keys = grp["fp"].to_numpy().astype(np.int64)
        if bits is None:
            # No sidecar (crash during build_hash_index's sidecar phase,
            # or a pre-sidecar index): the part directory may already
            # hold fingerprints this Bloom must cover — a sidecar built
            # from only the window's keys would report those on-disk
            # keys "definitely absent" (false negatives).  Rebuild from
            # the shard's full on-disk contents plus the new keys so the
            # "missing sidecar just means must-read" invariant holds.
            existing = _read_index_part(index_dir, int(part))
            _write_bloom(
                index_dir, int(part), bloom.build(np.concatenate([existing, keys]))
            )
        else:
            add = bloom.build_into(bits, keys)
            _write_bloom(index_dir, int(part), add)
    surv.write_parquet(index_dir, partition_cols=["part"])


# ---------------------------------------------------------------------------
# Incremental NEAR-dup: persisted LSH band index + signature shards
# ---------------------------------------------------------------------------
# The near-dup companion of the exact-fingerprint ingest index above:
# the accepted corpus persists (a) its LSH band rows partitioned by a
# fold of (band, band_hash) and (b) its packed MinHash signatures
# partitioned by a fold of doc_id.  A new window shuffles ONCE on the
# band fold, each shard consults exactly ONE band partition
# (per-band-segment searchsorted membership), and candidate pairs are
# verified by SIGNATURE-estimated Jaccard (mean of equal components —
# the standard signature-only verification; exact text verification
# would need the accepted corpus's texts, which the index deliberately
# does not store).  The accepted corpus itself is never scanned.

def _sig_batch(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text", num_perm: int = 64,
               n_parts: int = N_INDEX_PARTS) -> pa.Table:
    """(doc_id, sig, spart) for a batch — the ONE pass that pays the
    shingle+MinHash cost.  Signatures are FIXED-size binary
    (8*num_perm bytes): the whole column is one flat buffer, so both
    the persisted shards and every reader stay zero-copy (variable
    binary would force per-value Python bytes objects)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    sh, off = hashing.shingle_hashes_batch(batch.column(text_col).to_pylist())
    sig = hashing.minhash_signatures_batch(sh, off, num_perm)
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids),
         "sig": pa.FixedSizeBinaryArray.from_buffers(
             pa.binary(8 * num_perm), len(ids),
             [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())]),
         "spart": pa.array(hashing.fold_int64(ids, n_parts))}
    )


def _sig_matrix_col(col, num_perm: int) -> np.ndarray:
    """Zero-copy (n, num_perm) uint64 view of a fixed-size-binary
    signature column (chunked or plain)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
    start = arr.offset * num_perm
    return buf[start : start + len(arr) * num_perm].reshape(len(arr), num_perm)


def _bands_from_sig_batch(batch: pa.Table, num_perm: int = 64,
                          bands: int = 16,
                          n_parts: int = N_INDEX_PARTS) -> pa.Table:
    """Band rows DERIVED from a signature batch — no shingling: unpack
    the fixed-binary sig column zero-copy and fold band keys from it."""
    sig = _sig_matrix_col(batch.column("sig"), num_perm)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    keys = hashing.lsh_band_keys_batch(sig, bands, num_perm // bands)
    band = np.tile(np.arange(bands, dtype=np.int64), n)
    did = np.repeat(ids, bands)
    key = keys.reshape(-1)
    part = hashing.fold_pair_int64(band, key, n_parts)
    return pa.Table.from_pydict(
        {"doc_id": pa.array(did), "band": pa.array(band),
         "band_hash": pa.array(key), "part": pa.array(part)}
    )


def build_band_index(ds, index_dir: str, id_col: str = "doc_id",
                     text_col: str = "text", num_perm: int = 64,
                     bands: int = 16, n_parts: int = N_INDEX_PARTS) -> None:
    """Materialize the near-dup index for an accepted corpus:
    ``sigs/spart=K`` (doc_id, packed signature) and ``bands/part=K``
    (doc_id, band, band_hash).  The shingle+MinHash cost is paid ONCE:
    band rows derive from the signature shards just written.

    Crash-consistency by WRITE ORDER: sigs first, bands second.  A
    band row is the match trigger; a band row whose signature is
    missing would break verification (and now RAISES, see
    incremental_near_dup).  With sigs-first, a crash between the
    writes leaves orphan signatures (harmless: never probed) and the
    replayed window re-appends both (duplicate rows are ignored by
    membership semantics)."""
    import json as _json
    import os as _os

    meta_path = f"{index_dir}/meta.json"
    if _os.path.exists(meta_path):
        _check_index_meta(index_dir, num_perm, bands, n_parts)
    sigs = ds.map_batches(
        lambda t: _sig_batch(t, id_col, text_col, num_perm, n_parts),
        batch_format="pyarrow",
    ).materialize()
    sigs.write_parquet(f"{index_dir}/sigs", partition_cols=["spart"])
    sigs.map_batches(
        lambda t: _bands_from_sig_batch(t, num_perm, bands, n_parts),
        batch_format="pyarrow",
    ).write_parquet(f"{index_dir}/bands", partition_cols=["part"])
    if not _os.path.exists(meta_path):
        # ST2 pattern (store-discovered options): persist the sketch
        # parameters so later windows cannot silently probe with a
        # different partitioning/permutation count
        with open(meta_path, "w") as f:
            _json.dump({"num_perm": num_perm, "bands": bands,
                        "n_parts": n_parts, "version": 1}, f)


def _check_index_meta(index_dir: str, num_perm: int, bands: int,
                      n_parts: int) -> None:
    """Error on parameter mismatch vs the index manifest — a wrong
    ``n_parts`` would probe the wrong shard and SILENTLY find nothing
    (band folds miss), which is far worse than failing loudly."""
    import json as _json
    import os as _os

    meta_path = f"{index_dir}/meta.json"
    if not _os.path.exists(meta_path):
        return  # pre-manifest index: trust the caller
    with open(meta_path) as f:
        meta = _json.load(f)
    got = {"num_perm": num_perm, "bands": bands, "n_parts": n_parts}
    want = {k: meta[k] for k in got}
    if got != want:
        raise ValueError(
            f"near-dup index at {index_dir} was built with {want}; "
            f"queried with {got} — mismatched parameters probe the "
            "wrong shards and silently miss every match"
        )


def _read_part(dir_: str, col_filter: list, part_key: str, part: int):
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{dir_}/{part_key}={part}/*.parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=col_filter) for f in files])


def incremental_near_dup(window_ds, index_dir: str, id_col: str = "doc_id",
                         text_col: str = "text", threshold: float = 0.8,
                         num_perm: int = 64, bands: int = 16,
                         n_parts: int = N_INDEX_PARTS):
    """Near-dup matches of a NEW window against the accepted corpus\'s
    persisted band index (plus in-window matches), verified by
    signature-estimated Jaccard.

    Returns a pandas DataFrame (new_id, match_id, est_jaccard) with
    match_id < new_id for in-window pairs and match_id = the accepted
    doc for index hits; window docs absent from the result are the
    window\'s near-dup-free survivors.  The window is delta-sized (the
    minute-diff premise, same as the change pipeline): its signature
    table broadcasts via ``ray.put``; the ACCEPTED corpus is touched
    only through single-shard reads.  A band-index hit whose signature
    is missing from the sig shards RAISES — sigs are written before
    bands precisely so that can only mean corruption or mismatched
    ``n_parts``."""
    import ray
    import ray.data as rd

    _check_index_meta(index_dir, num_perm, bands, n_parts)

    # ONE shingle+MinHash pass over the window; bands derive from sigs
    win_sig_tbl = pa.concat_tables(
        list(window_ds.map_batches(
            lambda t: _sig_batch(t, id_col, text_col, num_perm, n_parts),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow"))
    )
    win_band = _bands_from_sig_batch(win_sig_tbl, num_perm, bands, n_parts)
    win_ids = win_sig_tbl.column("doc_id").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    win_order = np.argsort(win_ids, kind="stable")
    sig_ref = ray.put(
        {"ids": win_ids[win_order],
         "sigs": _sig_matrix_col(win_sig_tbl.column("sig"),
                                 num_perm)[win_order]}
    )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        wdid = g["doc_id"].to_numpy().astype(np.int64)
        wband = g["band"].to_numpy().astype(np.int64)
        wkey = g["band_hash"].to_numpy().astype(np.int64)
        out_new: list = []
        out_old: list = []
        shard = _read_part(f"{index_dir}/bands",
                           ["doc_id", "band", "band_hash"], "part", part)
        if shard is not None:
            sdid = shard.column("doc_id").to_numpy(zero_copy_only=False)
            sband = shard.column("band").to_numpy(zero_copy_only=False)
            skey = shard.column("band_hash").to_numpy(zero_copy_only=False)
            order = np.lexsort((sdid, skey, sband))
            sdid, sband, skey = sdid[order], sband[order], skey[order]
            seg = np.searchsorted(sband, np.arange(bands + 1))
            for b in range(bands):
                lo, hi = seg[b], seg[b + 1]
                if lo == hi:
                    continue
                m = wband == b
                if not m.any():
                    continue
                k = wkey[m]
                d = wdid[m]
                left = lo + np.searchsorted(skey[lo:hi], k, side="left")
                right = lo + np.searchsorted(skey[lo:hi], k, side="right")
                cnt = right - left
                hit = cnt > 0
                if not hit.any():
                    continue
                # expand each probe to ALL shard rows sharing its bucket
                reps = cnt[hit]
                out_new.append(np.repeat(d[hit], reps))
                starts_ = left[hit]
                idx = np.repeat(
                    starts_ - np.concatenate(
                        [[0], np.cumsum(reps[:-1])]
                    ), reps
                ) + np.arange(int(reps.sum()))
                out_old.append(sdid[idx])
        # in-window candidates: bucket-boundary pairs over window rows
        order = np.lexsort((wdid, wkey, wband))
        b_s, k_s, d_s = wband[order], wkey[order], wdid[order]
        new = np.ones(len(b_s), dtype=bool)
        new[1:] = (b_s[1:] != b_s[:-1]) | (k_s[1:] != k_s[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(b_s))
        ii, jj = _bucket_pair_indices(starts, ends, mega_cap=200)
        if len(ii):
            out_new.append(np.maximum(d_s[ii], d_s[jj]))
            out_old.append(np.minimum(d_s[ii], d_s[jj]))
        if not out_new:
            return pd.DataFrame(
                {"new_id": np.array([], dtype=np.int64),
                 "match_id": np.array([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"new_id": np.concatenate(out_new).astype(np.int64),
             "match_id": np.concatenate(out_old).astype(np.int64)}
        ).drop_duplicates()

    cand = (
        rd.from_arrow(win_band)
        .groupby("part")
        .map_groups(match, batch_format="pandas")
        .to_pandas()  # candidate pairs are delta-sized
    )
    empty_out = pd.DataFrame(
        {"new_id": pd.Series([], dtype="int64"),
         "match_id": pd.Series([], dtype="int64"),
         "est_jaccard": pd.Series([], dtype="float64")}
    )
    if not len(cand) or "new_id" not in cand.columns:
        return empty_out  # all groups empty: columns are dropped too
    cand = cand.drop_duplicates(subset=["new_id", "match_id"])
    cand = cand[cand["new_id"] != cand["match_id"]]
    if not len(cand):
        return empty_out

    # verify: est jaccard = mean equal signature components.  New-side
    # sigs come from the broadcast window matrix; old-side sigs from
    # the sig shards (single-shard reads keyed on the match_id fold)
    # or the window itself for in-window pairs.
    cand = cand.reset_index(drop=True)
    cand["spart"] = hashing.fold_int64(cand["match_id"].to_numpy(), n_parts)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(sig_ref)
        part = int(g["spart"].iloc[0])
        shard = _read_part(f"{index_dir}/sigs", ["doc_id", "sig"],
                           "spart", part)
        if shard is not None:
            odid = shard.column("doc_id").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            o_order = np.argsort(odid, kind="stable")
            odid = odid[o_order]
            omat = _sig_matrix_col(shard.column("sig"), num_perm)[o_order]
        else:
            odid = np.empty(0, dtype=np.int64)
            omat = np.empty((0, num_perm), dtype=np.uint64)

        def lookup(ids: np.ndarray) -> np.ndarray:
            # window first, then the shard; zero-copy searchsorted
            out = np.empty((len(ids), num_perm), dtype=np.uint64)
            wp = np.searchsorted(w["ids"], ids)
            wp_c = np.clip(wp, 0, max(0, len(w["ids"]) - 1))
            in_w = (len(w["ids"]) > 0) & (w["ids"][wp_c] == ids)
            if in_w.any():
                out[in_w] = w["sigs"][wp_c[in_w]]
            rest = ~in_w
            if rest.any():
                op = np.searchsorted(odid, ids[rest])
                op_c = np.clip(op, 0, max(0, len(odid) - 1))
                ok = (len(odid) > 0) & (odid[op_c] == ids[rest])
                if not ok.all():
                    missing = ids[rest][~ok][:5].tolist()
                    raise RuntimeError(
                        "near-dup index corruption: band rows matched "
                        f"doc ids {missing} but their signatures are "
                        "absent from the sig shards (mismatched n_parts "
                        "or a lost sigs/ partition)"
                    )
                out[rest] = omat[op_c]
            return out

        new_ids = g["new_id"].to_numpy().astype(np.int64)
        match_ids = g["match_id"].to_numpy().astype(np.int64)
        est = (lookup(new_ids) == lookup(match_ids)).mean(axis=1)
        keep = est >= threshold
        # floor(x*1e4+0.5)/1e4 (not np.round): matches the DuckDB
        # oracle mirror exactly — np.round is banker's at k/64 ties
        # (0.90625 -> 0.9062) where SQL ROUND is half-away (0.9063)
        return pd.DataFrame(
            {"new_id": new_ids[keep], "match_id": match_ids[keep],
             "est_jaccard": np.floor(est[keep] * 1e4 + 0.5) / 1e4}
        )

    out = (
        rd.from_pandas(cand)
        .groupby("spart")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if not len(out) or "new_id" not in out.columns:
        return empty_out
    return out.sort_values(["new_id", "match_id"]).reset_index(drop=True)


def update_band_index(survivor_ds, index_dir: str, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, n_parts: int = N_INDEX_PARTS) -> None:
    """Append the accepted window's band rows + signatures (the state
    advance; appends are new files per partition — a replayed window
    only adds duplicate rows, which membership semantics ignore)."""
    build_band_index(survivor_ds, index_dir, id_col, text_col, num_perm,
                     bands, n_parts)


# ---------------------------------------------------------------------------
# Triangle counting over the near-duplicate graph
# ---------------------------------------------------------------------------
def triangle_counts(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Per-node triangle counts over canonical (id_a < id_b) edges —
    DRIVER-sized variant (the dup graph after PPJoin is
    dup-cluster-sized, the `connected_components` size class).
    Wedge enumeration per apex + one vectorized merge against the edge
    set; exact, deterministic.  Returns (doc_id, triangles) for nodes
    in >= 1 triangle."""
    empty = pd.DataFrame({
        "doc_id": np.array([], dtype=np.int64),
        "triangles": np.array([], dtype=np.int64),
    })
    if not len(pairs_df):
        return empty
    a = pairs_df["id_a"].to_numpy(dtype=np.int64)
    b = pairs_df["id_b"].to_numpy(dtype=np.int64)
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    apex: list[np.ndarray] = []
    w1: list[np.ndarray] = []
    w2: list[np.ndarray] = []
    ua, starts, counts = np.unique(a, return_index=True, return_counts=True)
    # loop is over APEX NODES of the dup graph (not corpus rows); each
    # iteration emits that apex's wedge pairs in one triu_indices call
    for av, s, c in zip(ua, starts, counts):
        if c < 2:
            continue
        nb = b[s:s + c]  # sorted ascending within the apex group
        iu, ju = np.triu_indices(int(c), 1)
        w1.append(nb[iu])
        w2.append(nb[ju])
        apex.append(np.full(len(iu), av, dtype=np.int64))
    if not w1:
        return empty
    wed = pd.DataFrame({
        "apex": np.concatenate(apex),
        "x": np.concatenate(w1),
        "y": np.concatenate(w2),
    })
    closed = wed.merge(
        pd.DataFrame({"x": a, "y": b}), on=["x", "y"], how="inner"
    )
    if not len(closed):
        return empty
    ids = np.concatenate([
        closed["apex"].to_numpy(), closed["x"].to_numpy(),
        closed["y"].to_numpy(),
    ])
    uid, cnt = np.unique(ids, return_counts=True)
    return pd.DataFrame({
        "doc_id": uid.astype(np.int64),
        "triangles": cnt.astype(np.int64),
    })


def triangle_counts_distributed(pairs_ds, num_buckets: int = 256):
    """Exact per-node triangle counts as RAY stages — same result as
    :func:`triangle_counts` (a pytest pins equality): wedges are
    emitted per apex group (`groupby(a).map_groups`, one triu call per
    group), then wedges and edges are CO-SHUFFLED into
    ``hash(x, y) % num_buckets`` buckets and closed with a
    bucket-local vectorized merge — no `Dataset.join` (the round-4
    empty-block hash-join defect) and no edge set on the driver.
    Per-node rollup is one small groupby-count.

    Skew note: wedge count is sum(deg^2) — a hub apex inflates one
    group.  The scale escape is the standard degree-ordered direction
    (orient each edge low-degree -> high-degree before wedging), which
    caps group width at O(sqrt(m)); not needed at dup-graph sizes."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.hashing import hash_int64

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t.column("id_a").combine_chunks().cast(pa.int64()),
            "b": t.column("id_b").combine_chunks().cast(pa.int64()),
        })

    edges = pairs_ds.map_batches(canon, batch_format="pyarrow")

    def emit_wedges(g: pa.Table) -> pa.Table:
        nb = np.sort(g.column("b").to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        n = len(nb)
        empty = pa.table({
            "apex": pa.array([], type=pa.int64()),
            "x": pa.array([], type=pa.int64()),
            "y": pa.array([], type=pa.int64()),
        })
        if n < 2:
            return empty
        av = int(g.column("a")[0].as_py())
        iu, ju = np.triu_indices(n, 1)
        return pa.table({
            "apex": pa.array(np.full(len(iu), av, dtype=np.int64)),
            "x": pa.array(nb[iu]),
            "y": pa.array(nb[ju]),
        })

    wedges = edges.groupby("a").map_groups(
        emit_wedges, batch_format="pyarrow"
    )

    def tag(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            if kind == 0:
                apex = t.column("apex").to_numpy(zero_copy_only=False)
                x = t.column("x").to_numpy(zero_copy_only=False)
                y = t.column("y").to_numpy(zero_copy_only=False)
            else:
                x = t.column("a").to_numpy(zero_copy_only=False)
                y = t.column("b").to_numpy(zero_copy_only=False)
                apex = np.full(len(x), -1, dtype=np.int64)
            fold = (
                hash_int64(x.astype(np.int64)).view(np.uint64)
                ^ (hash_int64(y.astype(np.int64)).view(np.uint64)
                   >> np.uint64(1))
            ) % np.uint64(num_buckets)
            return pa.table({
                "bucket": pa.array(fold.astype(np.int64)),
                "apex": pa.array(apex.astype(np.int64)),
                "x": pa.array(x.astype(np.int64)),
                "y": pa.array(y.astype(np.int64)),
                "kind": pa.array(np.full(len(x), kind, dtype=np.int8)),
            })
        return fn

    both = wedges.map_batches(tag(0), batch_format="pyarrow").union(
        edges.map_batches(tag(1), batch_format="pyarrow")
    )

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # bucket-local exact closure: wedge (x, y) matches a real edge
        # row — merge compares BOTH ids, so fold collisions are inert
        w = g[g["kind"] == 0]
        e = g[g["kind"] == 1][["x", "y"]]
        if not len(w) or not len(e):
            return pd.DataFrame({"doc_id": np.array([], dtype=np.int64)})
        closed = w.merge(e, on=["x", "y"], how="inner")
        ids = np.concatenate([
            closed["apex"].to_numpy(), closed["x"].to_numpy(),
            closed["y"].to_numpy(),
        ]).astype(np.int64)
        return pd.DataFrame({"doc_id": ids})

    out = (
        both.groupby("bucket")
        .map_groups(close_bucket, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Count(alias_name="triangles"))
    )
    return out
