"""Similarity search over embedding columns (list<float>).

Baseline: brute-force top-k by dot product / cosine — the query matrix
is broadcast once (``ray.put``) and every batch does one numpy matmul
against it (vectorized, shuffle-free).  Scale path: LSH-bucketed
variant (random hyperplane signatures -> groupby bucket -> per-bucket
brute force), trading exactness for a candidate-set reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col).combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, batch.num_rows)
    return flat.reshape(batch.num_rows, dim)


class TopKScorer:
    """Actor stage: per-batch partial top-k against the broadcast query
    matrix; partials are merged in a tiny final groupby."""

    def __init__(self, query_ref, k: int, metric: str = "dot"):
        import ray

        q = ray.get(query_ref) if hasattr(query_ref, "hex") else query_ref
        self.qids = q["ids"]
        self.Q = q["vecs"]  # (nq, d) float64
        if metric == "cosine":
            norms = np.linalg.norm(self.Q, axis=1, keepdims=True)
            self.Q = self.Q / np.where(norms == 0, 1.0, norms)
        self.metric = metric
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _stack(batch, "embedding")
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if self.metric == "cosine":
            n = np.linalg.norm(X, axis=1, keepdims=True)
            X = X / np.where(n == 0, 1.0, n)
        S = self.Q @ X.T  # (nq, nb)
        k = min(self.k, S.shape[1])
        # per-query partial top-k within this batch
        part = np.argpartition(-S, kth=k - 1, axis=1)[:, :k]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(S.shape[0]):
            sel = part[qi]
            rows["query_id"].extend([int(self.qids[qi])] * len(sel))
            rows["neighbor_id"].extend(ids[sel].tolist())
            rows["score"].extend(S[qi, sel].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )


def brute_force_topk(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                     k: int = 10, metric: str = "dot") -> pd.DataFrame:
    """Exact top-k: per-batch partials -> global merge (driver holds
    only nq*k*n_blocks rows).  Deterministic tie-break (score desc,
    neighbor_id asc)."""
    import ray

    ref = ray.put({"ids": query_ids.astype(np.int64),
                   "vecs": query_vecs.astype(np.float64)})

    # task pool, not actor pool: the scorer is stateless apart from the
    # broadcast query matrix, and a per-batch ray.get of a plasma
    # object is zero-copy — so tasks skip the actor-pool spin-up that
    # dominated this entry's wall-time at bench scale (~2 s of ramp
    # for milliseconds of matmul)
    def score(batch: pa.Table) -> pa.Table:
        return TopKScorer(ref, k, metric)(batch)

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True], kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


#: fixed-point scale for the LSH signature dot products.  x·2^24 is an
#: EXACT float64 operation (power-of-two scaling), FLOOR is exact, and
#: the int64 plane sums cannot overflow at dim ≤ 256 — so the bucket
#: keys computed here are bit-identical to the DuckDB oracle mirror's.
LSH_QUANT = float(1 << 24)
#: salts separating the two LSH plane families (top-k vs near-dup)
LSH_SALT_TOPK = 1_000_003
LSH_SALT_PAIRS = 2_000_003


def lsh_plane_signs(dim: int, n_cols: int, salt: int) -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes:
    ``sign(c, d) = splitmix64(salt + c·256 + d) & 1 ? +1 : -1``
    (requires dim ≤ 256).  ±1 directions are a standard
    sign-random-projection variant (Achlioptas-style sparse/± random
    projections); deriving them from splitmix64 instead of a numpy
    Gaussian makes the bucket assignment SQL-expressible, so the
    approximate LSH entries are ORACLE-checked bit-exactly (same
    precedent as the KMV / MinHash splitmix64 mirrors)."""
    from ..functions.hashing import hash_int64

    if dim > 256:
        raise ValueError(f"lsh_plane_signs requires dim <= 256, got {dim}")
    idx = salt + np.arange(n_cols)[None, :] * 256 + np.arange(dim)[:, None]
    h = hash_int64(idx.astype(np.int64).ravel()).view(np.uint64)
    return np.where(
        (h & np.uint64(1)).astype(bool), np.int64(1), np.int64(-1)
    ).reshape(dim, n_cols)


def lsh_quantize(X: np.ndarray) -> np.ndarray:
    """int64 fixed-point view of the vectors used ONLY for signature
    bits — scoring always runs on the raw float64 vectors."""
    return np.floor(np.asarray(X, dtype=np.float64) * LSH_QUANT).astype(np.int64)


def lsh_bucketed_topk(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                      k: int = 10, n_planes: int = 8,
                      salt: int = LSH_SALT_TOPK) -> pd.DataFrame:
    """Approximate variant: random-hyperplane bucket per vector; only
    vectors sharing a query's bucket are scored (scale path — trades
    recall for a candidate reduction; bucket histogram documents the
    reduction).  Buckets come from quantized ±1 projections
    (`lsh_plane_signs`) so the candidate set is oracle-mirrorable."""
    import ray

    dim = query_vecs.shape[1]
    planes = lsh_plane_signs(dim, n_planes, salt)
    qsig = (lsh_quantize(query_vecs) @ planes > 0).astype(np.uint32)
    qkey = (qsig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    wanted = set(qkey.tolist())
    ref = ray.put({"ids": query_ids.astype(np.int64),
                   "vecs": query_vecs.astype(np.float64),
                   "planes": planes, "qkey": qkey})

    class BucketScorer:
        def __init__(self, ref_):
            q = ray.get(ref_) if hasattr(ref_, "hex") else ref_
            self.q = q

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _stack(batch, "embedding")
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            sig = (lsh_quantize(X) @ self.q["planes"] > 0).astype(np.uint32)
            key = (sig << np.arange(sig.shape[1], dtype=np.uint32)).sum(axis=1)
            keep = np.isin(key, list(wanted))
            X, ids, key = X[keep], ids[keep], key[keep]
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            for qi, qk in enumerate(self.q["qkey"]):
                m = key == qk
                if not m.any():
                    continue
                s = self.q["vecs"][qi] @ X[m].T
                rows["query_id"].extend([int(self.q["ids"][qi])] * int(m.sum()))
                rows["neighbor_id"].extend(ids[m].tolist())
                rows["score"].extend(s.tolist())
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array(rows["query_id"], type=pa.int64()),
                    "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                    "score": pa.array(rows["score"], type=pa.float64()),
                }
            )

    parts = ds.map_batches(
        BucketScorer, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [], "score": []})
    parts = parts.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


def train_ivf_centroids(train_vecs: np.ndarray, nlist: int = 32,
                        iters: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic coarse quantizer: k-means++ seeding + Lloyd
    iterations on a TRAINING SAMPLE (driver-side — the sample is small
    by construction; the corpus itself never leaves the cluster).
    Returns (nlist, d) float64 centroids."""
    X = np.asarray(train_vecs, dtype=np.float64)
    n = len(X)
    nlist = min(nlist, n)
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    cents = [X[int(rng.randint(n))]]
    d2 = np.full(n, np.inf)
    for _ in range(1, nlist):
        diff = X - cents[-1]
        d2 = np.minimum(d2, np.einsum("ij,ij->i", diff, diff))
        tot = d2.sum()
        if tot <= 0:
            cents.append(X[int(rng.randint(n))])
            continue
        r = rng.random_sample() * tot
        cents.append(X[int(np.searchsorted(np.cumsum(d2), r))])
    C = np.stack(cents)
    for _ in range(iters):
        # assign: argmin ||x-c||² = argmax (x·c - ½||c||²)
        half = 0.5 * np.einsum("ij,ij->i", C, C)
        a = np.argmax(X @ C.T - half[None, :], axis=1)
        for j in range(len(C)):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


class IvfScorer:
    """Actor stage for IVF-partitioned ANN: assigns each batch vector to
    its nearest coarse centroid (one matmul), keeps only vectors whose
    list is probed by SOME query, and scores them against exactly the
    queries probing that list.  At scale the corpus would be written
    partitioned by ``list_id`` so probes prune at the READ; this stage
    is the streaming form of the same math."""

    def __init__(self, ref, k: int):
        import ray

        q = ray.get(ref) if hasattr(ref, "hex") else ref
        self.qids = q["ids"]          # (nq,)
        self.Q = q["vecs"]            # (nq, d)
        self.C = q["centroids"]       # (nlist, d)
        self.probe = q["probe"]       # (nq, nprobe) list ids per query
        self.chalf = 0.5 * np.einsum("ij,ij->i", self.C, self.C)
        self.wanted = np.unique(self.probe)
        # reverse map: list id -> query indices probing it
        self.by_list: dict[int, np.ndarray] = {
            int(l): np.unique(np.nonzero(self.probe == l)[0])
            for l in self.wanted
        }
        self.k = k

    def _assign(self, X: np.ndarray) -> np.ndarray:
        return np.argmax(X @ self.C.T - self.chalf[None, :], axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _stack(batch, "embedding")
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        assign = self._assign(X)
        keep = np.isin(assign, self.wanted)
        X, ids, assign = X[keep], ids[keep], assign[keep]
        rows_q: list[np.ndarray] = []
        rows_n: list[np.ndarray] = []
        rows_s: list[np.ndarray] = []
        order = np.argsort(assign, kind="stable")
        runs = np.concatenate(
            [[0], np.flatnonzero(np.diff(assign[order])) + 1, [len(order)]]
        ) if len(order) else np.array([0, 0])
        for s, e in zip(runs[:-1], runs[1:]):
            if s == e:
                continue
            g = order[s:e]
            lst = int(assign[g[0]])
            qidx = self.by_list[lst]
            S = self.Q[qidx] @ X[g].T  # (nq_probing, n_in_list)
            kk = min(self.k, S.shape[1])
            part = np.argpartition(-S, kth=kk - 1, axis=1)[:, :kk]
            for row, qi in enumerate(qidx):
                sel = part[row]
                rows_q.append(np.full(len(sel), self.qids[qi], dtype=np.int64))
                rows_n.append(ids[g][sel])
                rows_s.append(S[row, sel])
        if not rows_q:
            return pa.Table.from_pydict(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.float64())}
            )
        return pa.Table.from_pydict(
            {"query_id": pa.array(np.concatenate(rows_q)),
             "neighbor_id": pa.array(np.concatenate(rows_n)),
             "score": pa.array(np.concatenate(rows_s))}
        )


def ivf_topk(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
             k: int = 10, nlist: int = 32, nprobe: int = 4,
             train_vecs: np.ndarray | None = None,
             train_sample: int = 16384, seed: int = 7) -> pd.DataFrame:
    """IVF-partitioned approximate top-k (the ANN scale path next to
    LSH): a coarse quantizer (k-means over a driver-side sample) splits
    the corpus into ``nlist`` inverted lists; each query scans only its
    ``nprobe`` nearest lists.  Candidate fraction ~ nprobe/nlist of the
    corpus with recall governed by quantizer quality — at 100 TB the
    lists are the Parquet partitioning key and probing prunes whole
    files at the read."""
    import ray

    if train_vecs is None:
        sample = ds.limit(train_sample).take_all()
        train_vecs = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in sample]
        )
    C = train_ivf_centroids(train_vecs, nlist=nlist, seed=seed)
    Q = query_vecs.astype(np.float64)
    probe = _probe_lists(Q, C, nprobe)
    return _ivf_query(ds, query_ids, Q, C, probe, k)


class IntIvfScorer(IvfScorer):
    """IVF scorer with INTEGER-EXACT assignment: both sides are
    fixed-point quantized (`lsh_quantize`) and the assignment score is
    ``2·(q(x)·q(c)) − q(c)·q(c)`` (the argmin ‖x−c‖² tree in integers,
    overflow-free at dim ≤ 256 and |x| ≲ 500).  ``np.argmax`` takes the
    FIRST max, so ties break toward the smallest centroid id when the
    centroid rows are ordered by id — exactly the SQL mirror's
    ``ORDER BY s DESC, cid``.  Candidate scoring still runs on the raw
    float vectors (only the PARTITIONING is quantized)."""

    def __init__(self, ref, k: int):
        super().__init__(ref, k)
        self.Cq = lsh_quantize(self.C)
        self.ccq = np.einsum("ij,ij->i", self.Cq, self.Cq)

    def _assign(self, X: np.ndarray) -> np.ndarray:
        s = 2 * (lsh_quantize(X) @ self.Cq.T) - self.ccq[None, :]
        return np.argmax(s, axis=1)


def sampled_centroids(ids: np.ndarray, X: np.ndarray,
                      nlist: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic coarse quantizer for the ORACLED IVF variant: the
    ``nlist`` corpus vectors whose splitmix64(vec_id) is smallest (in
    UNSIGNED order, matching SQL UBIGINT) are the centroids — a
    mergeable bottom-k sample (the KMV discipline), so at scale the
    selection is a map-side bottom-k + tiny merge, never a k-means
    fit.  Returned ordered by vec_id ascending so positional argmax
    tie-breaks equal the SQL mirror's (score DESC, cid ASC)."""
    from ..functions.hashing import hash_int64

    ids = np.asarray(ids, dtype=np.int64)
    h = hash_int64(ids).view(np.uint64)
    take = np.argsort(h, kind="stable")[: min(nlist, len(ids))]
    order = np.argsort(ids[take], kind="stable")
    sel = take[order]
    return ids[sel], np.asarray(X, dtype=np.float64)[sel]


def _probe_lists_int(Q: np.ndarray, C: np.ndarray, nprobe: int) -> np.ndarray:
    """Integer-exact probe selection (stable argsort of the quantized
    score: ties keep ascending centroid order — the SQL mirror's)."""
    Cq = lsh_quantize(C)
    s = 2 * (lsh_quantize(Q) @ Cq.T) - np.einsum("ij,ij->i", Cq, Cq)[None, :]
    npb = min(nprobe, C.shape[0])
    return np.argsort(-s, axis=1, kind="stable")[:, :npb].astype(np.int64)


def ivf_topk_sampled(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                     corpus_ids: np.ndarray, corpus_vecs: np.ndarray,
                     k: int = 10, nlist: int = 16,
                     nprobe: int = 4) -> pd.DataFrame:
    """IVF top-k over the splitmix64-SAMPLED quantizer with
    integer-exact assignment/probing — the partition-pruning ANN path
    whose candidate set (normally the un-checkable part of an ANN) IS
    oracle-checkable: centroid choice, assignment, and probe lists are
    all bit-reproducible in SQL; only the final in-list scoring is
    float, the same tree the exact `ann_topk` oracle pins."""
    import ray

    cent_ids, C = sampled_centroids(corpus_ids, corpus_vecs, nlist)
    Q = query_vecs.astype(np.float64)
    probe = _probe_lists_int(Q, C, nprobe)
    ref = ray.put({"ids": query_ids.astype(np.int64), "vecs": Q,
                   "centroids": C, "probe": probe})
    parts = ds.map_batches(
        IntIvfScorer, fn_constructor_args=(ref, k), batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [],
                             "score": []})
    parts = parts.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


def _probe_lists(Q: np.ndarray, C: np.ndarray, nprobe: int) -> np.ndarray:
    chalf = 0.5 * np.einsum("ij,ij->i", C, C)
    scores = Q @ C.T - chalf[None, :]
    npb = min(nprobe, C.shape[0])
    return np.argpartition(-scores, kth=npb - 1, axis=1)[:, :npb].astype(
        np.int64
    )


def _ivf_query(ds, query_ids, Q, C, probe, k) -> pd.DataFrame:
    """Shared scoring tail of the IVF variants: stream the candidate
    Dataset through IvfScorer, then global per-query top-k merge."""
    import ray

    ref = ray.put({"ids": query_ids.astype(np.int64), "vecs": Q,
                   "centroids": C, "probe": probe})
    parts = ds.map_batches(
        IvfScorer, fn_constructor_args=(ref, k), batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [],
                             "score": []})
    parts = parts.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


def ivf_build_index(ds, index_dir: str, nlist: int = 32,
                    train_vecs: np.ndarray | None = None,
                    train_sample: int = 16384, seed: int = 7) -> np.ndarray:
    """Persist the IVF layout — the literal at-scale form of the claim
    in :func:`ivf_topk`'s docstring: every corpus row is written into
    the Parquet partition of its inverted list (``list=K/*.parquet``),
    centroids stored alongside, so a query's ``nprobe`` probes prune
    whole FILES at the read (no full-corpus scan, not even a filter).
    Streaming build: assignment is one matmul per batch; nothing is
    collected on the driver beyond the centroid sample."""
    import pyarrow.parquet as pq

    if train_vecs is None:
        sample = ds.limit(train_sample).take_all()
        train_vecs = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in sample]
        )
    C = train_ivf_centroids(train_vecs, nlist=nlist, seed=seed)
    chalf = 0.5 * np.einsum("ij,ij->i", C, C)

    def assign(t: pa.Table) -> pa.Table:
        X = _stack(t, "embedding")
        a = np.argmax(X @ C.T - chalf[None, :], axis=1).astype(np.int64)
        return t.append_column("list", pa.array(a))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list"]
    )
    pq.write_table(
        pa.table({"centroid": pa.array([row.tolist() for row in C],
                                       type=pa.list_(pa.float64()))}),
        f"{index_dir}/_ivf_centroids.parquet",
    )
    return C


def ivf_topk_persisted(index_dir: str, query_ids: np.ndarray,
                       query_vecs: np.ndarray, k: int = 10,
                       nprobe: int = 4) -> pd.DataFrame:
    """Query a persisted IVF index: centroid scores pick the probe
    lists, ``read_parquet`` receives ONLY those lists' files — the
    unprobed partitions never leave storage.  Scoring math is shared
    with the streaming variant (IvfScorer recomputes the assignment
    from the same centroids, so results are identical to
    :func:`ivf_topk` with the same quantizer)."""
    import glob as _glob

    import pyarrow.parquet as pq
    import ray.data as rd

    C = np.stack(
        pq.read_table(f"{index_dir}/_ivf_centroids.parquet")
        .column("centroid").to_pylist()
    )
    Q = query_vecs.astype(np.float64)
    probe = _probe_lists(Q, C, nprobe)
    files = [
        f
        for l in np.unique(probe)
        for f in sorted(_glob.glob(f"{index_dir}/list={int(l)}/*.parquet"))
    ]
    if not files:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [],
                             "score": []})
    ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    return _ivf_query(ds, query_ids, Q, C, probe, k)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (the dedup-by-embedding op of the brief)
# ---------------------------------------------------------------------------
class _CosinePairScorer:
    """Actor stage: batch rows vs the broadcast full matrix; emits
    (id_a < id_b) pairs whose cosine >= threshold.  Expression tree is
    dot(a,b) / (|a| * |b|) with |v| = sqrt(dot(v,v)) — mirrored
    token-for-token by the SQL oracle."""

    def __init__(self, ref, threshold: float):
        import ray

        q = ray.get(ref) if hasattr(ref, "hex") else ref
        self.ids = q["ids"]
        self.X = q["vecs"]  # raw float64 (n, d)
        self.norms = np.sqrt(np.einsum("ij,ij->i", self.X, self.X))
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        B = _stack(batch, "embedding")
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        S = B @ self.X.T
        denom = nb[:, None] * self.norms[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = S / denom
        mask = (cos >= self.threshold) & (bids[:, None] < self.ids[None, :])
        bi, xi = np.nonzero(mask)
        return pa.Table.from_pydict(
            {
                "id_a": pa.array(bids[bi], type=pa.int64()),
                "id_b": pa.array(self.ids[xi], type=pa.int64()),
                "cosine": pa.array(cos[bi, xi], type=pa.float64()),
            }
        )


def cosine_near_dups(ds, all_vectors: pa.Table, threshold: float = 0.9,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """EXACT embedding-cosine near-dup pairs: each batch scores against
    the broadcast full matrix (the O(n²) baseline, blocked and
    distributed — the scale path is :func:`cosine_near_dups_lsh`)."""
    import ray

    ref = ray.put(
        {
            "ids": all_vectors.column(id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "vecs": _stack(all_vectors, vec_col),
        }
    )
    return ds.map_batches(
        _CosinePairScorer, fn_constructor_args=(ref, threshold),
        batch_format="pyarrow", concurrency=(1, 8),
    )


def cosine_near_dups_lsh(ds, threshold: float = 0.9, n_tables: int = 8,
                         planes_per_table: int = 4, salt: int = LSH_SALT_PAIRS,
                         max_bucket: int = 2000):
    """Scale path: MULTI-TABLE random-hyperplane LSH — each vector is
    exploded to ``n_tables`` (table, bucket) rows; pairs sharing any
    table's bucket are candidates; within-bucket pairwise cosine
    verifies; a final (id_a, id_b) groupby dedupes cross-table repeats.
    For collision prob p = 1 - acos(cos)/π per plane, recall ≈
    1 - (1 - p^planes)^tables — tables trade shuffle volume for
    recall (no all-pairs, no broadcast matrix).  Oversized buckets
    chain-pair like the MinHash path."""
    planes_holder = {}

    def sig_batch(t: pa.Table) -> pa.Table:
        X = _stack(t, "embedding")
        if "planes" not in planes_holder:
            planes_holder["planes"] = lsh_plane_signs(
                X.shape[1], n_tables * planes_per_table, salt
            )
        sig = (lsh_quantize(X) @ planes_holder["planes"] > 0).astype(np.uint32)
        n = t.num_rows
        ids = t.column("vec_id").combine_chunks()
        emb = t.column("embedding").combine_chunks()
        out_tables = []
        for b in range(n_tables):
            sub = sig[:, b * planes_per_table : (b + 1) * planes_per_table]
            key = (sub << np.arange(planes_per_table, dtype=np.uint32)).sum(axis=1)
            out_tables.append(
                pa.Table.from_arrays(
                    [
                        ids,
                        pa.array(np.full(n, b, dtype=np.int32)),
                        pa.array(key.astype(np.int64)),
                        emb,
                    ],
                    names=["vec_id", "table", "bucket", "embedding"],
                )
            )
        return pa.concat_tables(out_tables)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = g["vec_id"].to_numpy().astype(np.int64)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        if n > max_bucket:
            order = np.argsort(ids)
            a, b = order[:-1], order[1:]
        else:
            a, b = np.triu_indices(n, k=1)
        dots = np.einsum("ij,ij->i", X[a], X[b])
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (norms[a] * norms[b])
        keep = cos >= threshold
        ia, ib = ids[a[keep]], ids[b[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[keep]})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return (
        ds.map_batches(sig_batch, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(dedup, batch_format="pandas")
    )


KMEANS_SCALE = 16777216  # 2^24 fixed point; +1 shift keeps values positive


def kmeans_quantize(X: np.ndarray) -> np.ndarray:
    """floor((x + 1)·2^24) int64 fixed point.  The +1 shift makes every
    quantized coordinate positive so the centroid update's integer
    floor-division has identical semantics in numpy (``//`` floors)
    and DuckDB (``//`` truncates toward zero): they agree on
    non-negative operands.  The shift cancels in every distance, so
    assignments equal the unshifted ones."""
    return np.floor(
        (np.asarray(X, dtype=np.float64) + 1.0) * KMEANS_SCALE
    ).astype(np.int64)


def _kmeans_assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    # argmin of -2 q·c + |c|² == argmin |q-c|² (|q|² is constant per
    # row); np.argmin takes the FIRST minimum => ties go to the
    # smaller cluster id, the SQL mirror's (dist, c) order.
    s = (-2) * (Q @ C.T) + np.einsum("ij,ij->i", C, C)[None, :]
    return np.argmin(s, axis=1)


def kmeans_lloyd_quantized(ds, k: int = 8, iters: int = 5):
    """Distributed integer-exact Lloyd's k-means over the embedding
    column.  Returns ``(centroids int64 (k, dim), assignment Dataset
    of (vec_id, cluster, dist2))``.

    Oracle-ability (the KMV/LSH discipline from NOTES round 4): init
    is the splitmix64 bottom-k sample (cluster j = j-th smallest hash
    in UNSIGNED order), every distance and centroid update is int64
    arithmetic over kmeans_quantize vectors, distance ties go to the
    smaller cluster id, and an emptied cluster keeps its previous
    centroid — every rule is SQL-expressible, so the full
    ``iters``-step trajectory is bit-identical to the DuckDB mirror
    (queries._embedding_kmeans_sql).

    Distributed shape, per iteration: one streamed pass emits k·(dim+1)
    int64 partial rows per block (cluster sums in long form + member
    counts), then ONE tiny groupby(key).sum() — the exchange is
    O(k·dim·blocks), never O(corpus) — and the (k, dim) floor-div
    rebuild happens on the driver and re-broadcasts via ray.put.  The
    corpus is re-read column-pruned each iteration: the streaming
    100-TB form (no corpus-sized working set pinned in the object
    store)."""
    import ray

    from ..functions.hashing import hash_int64

    def bottom(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "h": pa.array([], type=pa.int64()),
                "vec": pa.array([], type=pa.list_(pa.int64())),
            })
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = hash_int64(ids).view(np.uint64)
        take = np.argsort(h, kind="stable")[: min(k, len(ids))]
        Q = kmeans_quantize(_stack(t, "embedding"))[take]
        return pa.table({
            "h": pa.array(h[take].view(np.int64)),
            "vec": pa.array(list(Q), type=pa.list_(pa.int64())),
        })

    part = ds.map_batches(bottom, batch_format="pyarrow").take_all()
    hs = np.array([r["h"] for r in part], dtype=np.int64).view(np.uint64)
    order = np.argsort(hs, kind="stable")[: min(k, len(hs))]
    cent = np.array([part[i]["vec"] for i in order], dtype=np.int64)
    k_eff, dim = cent.shape

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
            })
            if t.num_rows == 0:
                return empty
            C = ray.get(_ref)
            Q = kmeans_quantize(_stack(t, "embedding"))
            a = _kmeans_assign(Q, C)
            sums = np.zeros((k_eff, dim), dtype=np.int64)
            np.add.at(sums, a, Q)
            cnt = np.bincount(a, minlength=k_eff).astype(np.int64)
            keys = np.concatenate([
                np.arange(k_eff * dim, dtype=np.int64),
                k_eff * dim + np.arange(k_eff, dtype=np.int64),
            ])
            vals = np.concatenate([sums.ravel(), cnt])
            nz = vals != 0
            return pa.table({"key": pa.array(keys[nz]),
                             "s": pa.array(vals[nz])})

        # the per-block partials are k·(dim+1) rows — blocks-tiny at any
        # corpus size — so the reduce is a driver-side integer np.add
        # over streamed batches, not a groupby shuffle (saves one
        # AllToAll per iteration; int sums are order-free so the
        # result is identical)
        sums = np.zeros((k_eff, dim), dtype=np.int64)
        cnt = np.zeros(k_eff, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            keys = b.column("key").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals = b.column("s").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            is_cnt = keys >= k_eff * dim
            np.add.at(cnt, keys[is_cnt] - k_eff * dim, vals[is_cnt])
            fk = keys[~is_cnt]
            np.add.at(sums, (fk // dim, fk % dim), vals[~is_cnt])
        live = cnt > 0
        cent = cent.copy()
        cent[live] = sums[live] // cnt[live][:, None]

    fref = ray.put(cent)

    def final(t: pa.Table, _ref=fref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "dist2": pa.array([], type=pa.int64()),
            })
        C = ray.get(_ref)
        Q = kmeans_quantize(_stack(t, "embedding"))
        a = _kmeans_assign(Q, C)
        diff = Q - C[a]
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(np.einsum("ij,ij->i", diff, diff)),
        })

    return cent, ds.map_batches(final, batch_format="pyarrow")


def pq_topk_sampled(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                    corpus_ids: np.ndarray, corpus_vecs: np.ndarray,
                    k: int = 10, m: int = 8, ks: int = 16) -> pd.DataFrame:
    """Product-quantization ANN (Jegou/Douze/Schmid 2011, "Product
    quantization for nearest neighbor search") over a splitmix64-
    SAMPLED codebook — the memory-compression scale path: each vector
    is stored as ``m`` one-byte codes (here m=8 over dim/m-dim
    subspaces, ks=16 codewords each), and query-to-vector distance is
    the ADC sum of per-subspace table lookups, so a 100-TB corpus'
    search working set is m bytes/vector instead of 4·dim.

    Oracle-ability (the sampled-IVF discipline): the codebook is the
    bottom-``ks`` vec_ids by splitmix64 (mergeable bottom-k, ordered
    by vec_id so codeword index matches SQL's ROW_NUMBER), encoding
    and ADC distances are int64 arithmetic over floor(x·2^24)
    fixed-point subvectors with ties to the smaller codeword — the
    whole answer, not just the candidate set, is bit-reproducible in
    DuckDB.

    Distributed shape: the codebook + per-query ADC tables
    (queries × m × ks int64 — O(1)) broadcast via ray.put; ONE
    streamed pass encodes each batch (m int64 matmuls) and emits a
    per-batch per-query top-k partial; the driver merges
    queries·k·blocks rows.  No shuffle, nothing corpus-sized leaves
    the tasks."""
    import ray

    cw_ids, C = sampled_centroids(corpus_ids, corpus_vecs, ks)
    dim = C.shape[1]
    ds_sub = dim // m
    Cq = np.floor(C * KMEANS_SCALE).astype(np.int64).reshape(ks, m, ds_sub)
    Qq = np.floor(
        np.asarray(query_vecs, dtype=np.float64) * KMEANS_SCALE
    ).astype(np.int64).reshape(len(query_ids), m, ds_sub)
    # ADC tables: A[q, s, c] = ||query_q subvector s - codeword c||^2
    dots = np.einsum("qsd,csd->qsc", Qq, Cq)
    q2 = np.einsum("qsd,qsd->qs", Qq, Qq)
    c2 = np.einsum("csd,csd->cs", Cq, Cq)
    A = q2[:, :, None] + c2.T[None, :, :] - 2 * dots
    ref = ray.put({
        "qids": np.asarray(query_ids, dtype=np.int64),
        "A": A, "Cq": Cq, "k": k,
    })

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "adc_dist2": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        import ray as _ray

        cfg = _ray.get(_ref)
        qids, At, Ct, kk = cfg["qids"], cfg["A"], cfg["Cq"], cfg["k"]
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        X = np.floor(_stack(t, "embedding") * KMEANS_SCALE).astype(
            np.int64
        ).reshape(len(ids), Ct.shape[1], Ct.shape[2])
        # encode: nearest codeword per subspace (argmin = first minimal
        # index = ties to the smaller codeword, matching the SQL)
        d = np.einsum("nsd,csd->nsc", X, Ct)
        x2 = np.einsum("nsd,nsd->ns", X, X)
        cc2 = np.einsum("csd,csd->cs", Ct, Ct)
        code = np.argmin(
            x2[:, :, None] + cc2.T[None, :, :] - 2 * d, axis=2
        )
        rows_q, rows_n, rows_d = [], [], []
        sidx = np.arange(Ct.shape[1])
        for qi, qid in enumerate(qids):
            adc = At[qi][sidx[None, :], code].sum(axis=1)
            take = min(kk, len(ids))
            part = np.argpartition(adc, take - 1)[:take]
            rows_q.append(np.full(take, qid, dtype=np.int64))
            rows_n.append(ids[part])
            rows_d.append(adc[part])
        return pa.table({
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
            "adc_dist2": pa.array(np.concatenate(rows_d)),
        })

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"query_id": [], "neighbor_id": [],
                             "rank": [], "adc_dist2": []})
    parts = parts.sort_values(
        ["query_id", "adc_dist2", "neighbor_id"], kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "adc_dist2"]]


def ivfpq_topk_sampled(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                       corpus_ids: np.ndarray, corpus_vecs: np.ndarray,
                       k: int = 10, nlist: int = 16, nprobe: int = 4,
                       m: int = 8, ks: int = 16) -> pd.DataFrame:
    """IVF-PQ — the composed FAISS-style 100-TB ANN layout: a coarse
    sampled quantizer prunes the scan to ``nprobe`` inverted lists
    (at scale: Parquet partitions, see ivf_build_index) and PQ codes
    compress what remains to ``m`` bytes/vector scored by ADC table
    lookups.  Both stages reuse the session's oracle disciplines —
    splitmix64 bottom-k sampling (one shared sample serves as coarse
    centroids AND PQ codebook), integer fixed-point assignment /
    probing / encoding / ADC — so the ENTIRE ranking is
    bit-reproducible in SQL.  PQ encodes RAW vectors, not IVF
    residuals (the classic refinement; documented simplification that
    keeps the mirror one CTE set instead of a per-list one).

    Distributed shape: one broadcast (centroids + probe lists + ADC
    tables, all O(nlist·m·ks)), one streamed pass that assigns, masks
    to probed lists, gathers ADC sums, and emits per-batch per-query
    top-k partials; driver merges queries·k·blocks rows."""
    import ray

    cw_ids, C = sampled_centroids(corpus_ids, corpus_vecs, max(nlist, ks))
    Cq = lsh_quantize(C)
    dim = C.shape[1]
    ds_sub = dim // m
    Csub = Cq[:ks].reshape(ks, m, ds_sub)
    Qint = lsh_quantize(np.asarray(query_vecs, dtype=np.float64))
    probe = _probe_lists_int(np.asarray(query_vecs, dtype=np.float64),
                             C[:nlist], nprobe)
    Qsub = Qint.reshape(len(query_ids), m, ds_sub)
    dots = np.einsum("qsd,csd->qsc", Qsub, Csub)
    q2 = np.einsum("qsd,qsd->qs", Qsub, Qsub)
    c2 = np.einsum("csd,csd->cs", Csub, Csub)
    A = q2[:, :, None] + c2.T[None, :, :] - 2 * dots
    coarse = Cq[:nlist]
    cnorm = np.einsum("ij,ij->i", coarse, coarse)
    ref = ray.put({
        "qids": np.asarray(query_ids, dtype=np.int64),
        "A": A, "Csub": Csub, "coarse": coarse, "cnorm": cnorm,
        "probe": probe, "k": k,
    })

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "adc_dist2": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        cfg = ray.get(_ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        Xq = lsh_quantize(_stack(t, "embedding"))
        # coarse assignment: integer score argmax, ties -> smaller cid
        s = 2 * (Xq @ cfg["coarse"].T) - cfg["cnorm"][None, :]
        lst = np.argmax(s, axis=1).astype(np.int64)
        Ct = cfg["Csub"]
        Xs = Xq.reshape(len(ids), Ct.shape[1], Ct.shape[2])
        d = np.einsum("nsd,csd->nsc", Xs, Ct)
        x2 = np.einsum("nsd,nsd->ns", Xs, Xs)
        cc2 = np.einsum("csd,csd->cs", Ct, Ct)
        code = np.argmin(x2[:, :, None] + cc2.T[None, :, :] - 2 * d, axis=2)
        rows_q, rows_n, rows_d = [], [], []
        sidx = np.arange(Ct.shape[1])
        for qi, qid in enumerate(cfg["qids"]):
            member = np.isin(lst, cfg["probe"][qi])
            if not member.any():
                continue
            midx = np.flatnonzero(member)
            adc = cfg["A"][qi][sidx[None, :], code[midx]].sum(axis=1)
            take = min(cfg["k"], len(midx))
            part = np.lexsort((ids[midx], adc))[:take]
            rows_q.append(np.full(take, qid, dtype=np.int64))
            rows_n.append(ids[midx][part])
            rows_d.append(adc[part])
        if not rows_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
            "adc_dist2": pa.array(np.concatenate(rows_d)),
        })

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"query_id": [], "neighbor_id": [],
                             "rank": [], "adc_dist2": []})
    parts = parts.sort_values(
        ["query_id", "adc_dist2", "neighbor_id"], kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "adc_dist2"]]
