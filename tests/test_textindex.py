"""Persisted inverted-index BM25 (stages/textindex): the scan-based
and index-based plans must return identical rows (they share one SQL
oracle), and the index layout must support term-partition pruning."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from osm_live_updates_ray.functions.hashing import (
    fold_int64,
    hash_strings_poly,
)
from osm_live_updates_ray.queries import _BM25_TERMS, QUERIES


def _write_docs(tmp_path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


class TestBm25Indexed:
    def test_equals_scan_variant(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        vocab = list(_BM25_TERMS) + [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
            for _ in range(80)
        ]
        sf = _write_docs(tmp_path, texts)
        scan = QUERIES["bm25_topk"](sf).reset_index(drop=True)
        idx = QUERIES["bm25_topk_indexed"](sf).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            scan.astype({"rank": np.int64}), idx.astype({"rank": np.int64})
        )

    def test_index_layout_prunes_at_the_read(self, ray_session, tmp_path):
        from osm_live_updates_ray.stages.textindex import (
            bm25_query_indexed,
            build_inverted_index,
        )
        import ray.data as rd

        sf = _write_docs(
            tmp_path, ["column window scan", "column filler", "other words"]
        )
        index_dir = str(tmp_path / "idx")
        meta = build_inverted_index(
            rd.read_parquet(f"{sf}/documents.parquet"), index_dir
        )
        assert meta["n_docs"] == 3 and meta["total_tokens"] == 7
        # every posting lives in the bucket of its term's hash — the
        # property the query's file-glob pruning relies on
        for f in glob.glob(f"{index_dir}/postings/bucket=*/*.parquet"):
            b = int(f.split("bucket=")[1].split("/")[0])
            terms = pq.read_table(f).column("term").to_numpy(
                zero_copy_only=False
            ).astype(object)
            got = fold_int64(hash_strings_poly(terms), meta["n_buckets"])
            assert (got == b).all()
        out = bm25_query_indexed(index_dir, _BM25_TERMS, k=10)
        # doc 2 shares no query term and must be absent
        assert set(out["doc_id"]) == {0, 1}
        # doc 0 holds all three terms at the same length: higher score
        assert out.iloc[0]["doc_id"] == 0
