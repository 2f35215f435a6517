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
    parts = ds.map_batches(
        TopKScorer,
        fn_constructor_args=(ref, k, metric),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).to_pandas()
    parts = parts.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True], kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


def lsh_bucketed_topk(ds, query_ids: np.ndarray, query_vecs: np.ndarray,
                      k: int = 10, n_planes: int = 8, seed: int = 11) -> pd.DataFrame:
    """Approximate variant: random-hyperplane bucket per vector; only
    vectors sharing a query's bucket are scored (scale path — trades
    recall for a candidate reduction; bucket histogram documents the
    reduction)."""
    import ray

    dim = query_vecs.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (query_vecs.astype(np.float64) @ planes > 0).astype(np.uint32)
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
            sig = (X @ self.q["planes"] > 0).astype(np.uint32)
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
