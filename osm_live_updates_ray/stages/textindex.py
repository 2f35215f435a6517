"""Persisted inverted index + BM25 query over it — the at-scale form
of full-text search: a 100-TB corpus is searched by reading ONLY the
postings partitions of the query's terms (read-level pruning, the
`ivf_build_index` discipline applied to text), never by scanning
documents.

Layout under ``index_dir``:
  postings/bucket=K/*.parquet   rows (term, doc_id, tf, dl) — the doc
                                length is DENORMALIZED into every
                                posting so scoring needs no doc-table
                                join; bucket = fold(hash(term))
  meta.json                     {n_docs, total_tokens, n_buckets}

Build is one streamed pass (per-batch term factorization + one
np.unique over (doc, term-code) — no Python loop over rows) and a
partitioned write; nothing is collected on the driver but two
counters.  The reference has no text-search analog; semantics follow
Okapi BM25 (Robertson/Walker), shared with `queries.bm25_topk`.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fold_int64, hash_strings_poly

K1, B = 1.2, 0.75


def _postings_of(t: pa.Table, n_buckets: int) -> pa.Table:
    """(term, doc_id, tf, dl, bucket) rows for one (doc_id, text)
    batch — tf per distinct (doc, term) via dictionary encoding +
    one sorted-unique pass."""
    lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
    off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = off[1:] - off[:-1]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    if int(lens.sum()) == 0:
        return pa.table({
            "term": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int64()),
            "dl": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
        })
    enc = lists.values.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    vocab = enc.dictionary
    didx = np.repeat(np.arange(len(ids)), lens)
    key = didx * len(vocab) + codes
    uk, tf = np.unique(key, return_counts=True)
    u_d, u_c = uk // len(vocab), uk % len(vocab)
    terms = vocab.take(pa.array(u_c))
    h = hash_strings_poly(terms.to_numpy(zero_copy_only=False).astype(object))
    return pa.table({
        "term": terms,
        "doc_id": pa.array(ids[u_d]),
        "tf": pa.array(tf.astype(np.int64)),
        "dl": pa.array(lens[u_d]),
        "bucket": pa.array(fold_int64(h, n_buckets).astype(np.int64)),
    })


def build_inverted_index(ds, index_dir: str, n_buckets: int = 32) -> dict:
    """Stream the corpus into the partitioned postings layout and
    return the meta dict (also persisted as meta.json)."""
    post = ds.map_batches(
        lambda t: _postings_of(t, n_buckets), batch_format="pyarrow"
    )
    post.write_parquet(f"{index_dir}/postings", partition_cols=["bucket"])
    # global doc/token counters: tiny per-batch partials, driver sum
    n_docs = tot = 0
    for bt in ds.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "tok": pa.array([int(pc.sum(pc.list_value_length(
                pc.split_pattern(t.column("text"), " "))).as_py() or 0)],
                type=pa.int64()),
        }),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        # partial rows coalesce across blocks in iter_batches —
        # sum the whole column, never read just row 0
        n_docs += int(pc.sum(bt.column("n")).as_py() or 0)
        tot += int(pc.sum(bt.column("tok")).as_py() or 0)
    meta = {"n_docs": n_docs, "total_tokens": tot, "n_buckets": n_buckets}
    with open(f"{index_dir}/meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def bm25_query_indexed(index_dir: str, terms: tuple[str, ...],
                       k: int = 10) -> pd.DataFrame:
    """BM25 top-k from the persisted index: ONLY the query terms'
    postings partitions are read (unlisted buckets never leave
    storage); df comes from a map-side count over those postings, the
    per-doc sum is one fold(doc_id) shuffle of the pruned postings,
    and the driver merges per-group top-k partials.  Rounding / tie
    rules match `queries.bm25_topk`, so both variants share one SQL
    oracle."""
    import glob as _glob

    import ray
    import ray.data as rd

    from ..queries import _round

    with open(f"{index_dir}/meta.json") as f:
        meta = json.load(f)
    n_docs, avgdl = meta["n_docs"], meta["total_tokens"] / meta["n_docs"]
    tarr = np.array(list(terms), dtype=object)
    buckets = np.unique(fold_int64(hash_strings_poly(tarr),
                                   meta["n_buckets"]))
    files = [
        f
        for b in buckets
        for f in sorted(
            _glob.glob(f"{index_dir}/postings/bucket={int(b)}/*.parquet")
        )
    ]
    cols = ["doc_id", "term", "tf", "dl"]
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype=np.int64),
        "bm25": pd.Series([], dtype=np.float64),
        "rank": pd.Series([], dtype=np.int64),
    })
    if not files:
        return empty
    tset = pa.array(list(terms), type=pa.string())

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("term"), value_set=tset))

    pruned = rd.read_parquet(files, columns=cols).map_batches(
        prune, batch_format="pyarrow"
    ).materialize()

    # pass 1: df per term ((term, doc) rows are unique by construction)
    df = dict.fromkeys(terms, 0)
    for bt in pruned.map_batches(
        lambda t: pa.table({
            "term": pc.value_counts(t.column("term")).field("values"),
            "c": pc.value_counts(t.column("term")).field("counts").cast(
                pa.int64()),
        }),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for term, c in zip(bt.column("term").to_pylist(),
                           bt.column("c").to_pylist()):
            df[term] += c
    idf = {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in df.items()
    }
    iref = ray.put(idf)

    def add_fold(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "fold", pa.array(fold_int64(d).astype(np.int64))
        )

    def score_group(g: pa.Table, _ref=iref) -> pa.Table:
        w = ray.get(_ref)
        d = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        tf = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = g.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        iv = np.array(
            [w[t] for t in g.column("term").to_pylist()], dtype=np.float64
        )
        contrib = iv * (tf * 2.2) / (tf + K1 * (1 - B + B * dl / avgdl))
        uids, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(uids), dtype=np.float64)
        np.add.at(s, inv, contrib)
        s = _round(s, 4)
        take = min(k, len(uids))
        if take < len(uids):
            # tie-aware partial (see queries.bm25_topk): the k-th
            # rounded score's ties must keep the smaller doc_id
            part = np.lexsort((uids, -s))[:take]
            uids, s = uids[part], s[part]
        return pa.table({"doc_id": pa.array(uids), "bm25": pa.array(s)})

    parts = (
        pruned.map_batches(add_fold, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(score_group, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(parts):
        return empty
    parts = parts.sort_values(
        ["bm25", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts[["doc_id", "bm25", "rank"]]
