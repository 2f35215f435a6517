"""Round-4 additions: Gopher composite quality filter, CCNet-style
boilerplate line dedup, distributed integer-exact Lloyd k-means (the
oracle gate covers the SQL equivalence; these pin the semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osm_live_updates_ray.queries import QUERIES


def _write_docs(tmp_path, texts, sources=None, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    cols = {"doc_id": pa.array(ids, type=pa.int64()), "text": texts}
    if sources is not None:
        cols["source"] = sources
    pq.write_table(pa.table(cols), tmp_path / "documents.parquet")
    return str(tmp_path)


class TestGopherQualityFilter:
    def test_each_rule_fires(self, ray_session, tmp_path):
        # 42 words, mean word len (3+40*4+1)/42 = 3.905, 2 stopwords
        good = "the " + " ".join(f"wd{i:02d}" for i in range(40)) + " a"
        short = "the quick a fox"                      # < 30 words
        no_stop = " ".join(f"tok{i:02d}" for i in range(40))  # 0 stopwords
        repeat = "the a " + " ".join(["spam"] * 40)    # top word > 0.15
        long_words = "the a " + " ".join(
            f"extraordinarily{i}" for i in range(38)
        )                                              # mean word len > 4.8
        sf = _write_docs(tmp_path, [good, short, no_stop, repeat, long_words])
        out = (
            QUERIES["gopher_quality_filter"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[0, "passes"] == 1
        assert out.loc[1, "passes"] == 0 and out.loc[1, "n_words"] == 4
        assert out.loc[2, "passes"] == 0 and out.loc[2, "stopword_count"] == 0
        assert out.loc[3, "passes"] == 0 and out.loc[3, "top_word_frac"] > 0.15
        assert out.loc[4, "passes"] == 0 and out.loc[4, "mean_word_len"] > 4.8

    def test_features_exact(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, ["the the a bb ccc"])
        out = QUERIES["gopher_quality_filter"](sf).to_pandas().iloc[0]
        assert out["n_words"] == 5
        assert out["stopword_count"] == 3
        # nonspace chars = 3+3+1+2+3 = 12 over 5 words
        assert out["mean_word_len"] == 2.4
        assert out["top_word_frac"] == 0.4


class TestLineDedupCcnet:
    def test_footer_lines_removed_body_kept(self, ray_session, tmp_path):
        # 4 docs, same source: every per-source footer line occurs in
        # 4 >= 3 docs => removed; the unique bodies survive.
        texts = [f"unique body number {i}" for i in range(4)]
        sf = _write_docs(tmp_path, texts, sources=["s0"] * 4,
                         ids=[0, 5, 10, 97])
        out = (
            QUERIES["line_dedup_ccnet"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert (out["n_lines"] == 5).all()
        for i, did in enumerate([0, 5, 10, 97]):
            assert out.loc[did, "text"].startswith(f"unique body number {i}")
        # ids 0,5,10 share doc_id%5==0 => promo line removed for them;
        # all ref-id lines are singletons (distinct %97) => kept
        assert out.loc[0, "n_removed"] == 3
        assert out.loc[97, "n_removed"] == 2  # only the 2 per-source lines
        assert "ref id 0 of s0" in out.loc[0, "text"]
        assert "copyright s0 all rights reserved" not in out.loc[0, "text"]

    def test_boilerplate_is_source_scoped(self, ray_session, tmp_path):
        # identical footer text under DIFFERENT sources never crosses
        # the per-source threshold.
        texts = [f"body {i}" for i in range(4)]
        sf = _write_docs(tmp_path, texts, sources=["a", "b", "c", "d"])
        out = QUERIES["line_dedup_ccnet"](sf).to_pandas()
        assert (out["n_removed"] == 0).all()


class TestEmbeddingKmeans:
    def _write_emb(self, tmp_path, X, ids=None):
        ids = list(range(len(X))) if ids is None else ids
        pq.write_table(
            pa.table({
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in X],
                    type=pa.list_(pa.float32()),
                ),
            }),
            tmp_path / "embeddings.parquet",
        )
        return str(tmp_path)

    def test_separable_clusters_recovered(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        centers = rng.normal(size=(3, 8)) * 5
        X = np.concatenate([
            centers[i] + rng.normal(scale=0.05, size=(30, 8))
            for i in range(3)
        ]).astype(np.float32)
        X = np.clip(X / 10.0, -0.9, 0.9)
        truth = np.repeat(np.arange(3), 30)
        sf = self._write_emb(tmp_path, X)
        import ray

        from osm_live_updates_ray.stages.similarity import (
            kmeans_lloyd_quantized,
        )

        _, out = kmeans_lloyd_quantized(
            ray.data.read_parquet(f"{sf}/embeddings.parquet"), k=3, iters=5
        )
        df = out.to_pandas().sort_values("vec_id")
        a = df["cluster"].to_numpy()
        # perfect recovery up to label permutation on separable blobs
        for g in range(3):
            assert len(set(a[truth == g])) == 1
        assert len({a[truth == g][0] for g in range(3)}) == 3

    def test_matches_driver_numpy_reference(self, ray_session, tmp_path):
        rng = np.random.default_rng(11)
        X = rng.uniform(-0.5, 0.5, size=(120, 16)).astype(np.float32)
        ids = np.arange(120, dtype=np.int64)
        sf = self._write_emb(tmp_path, X, ids=list(ids))
        import ray

        from osm_live_updates_ray.functions.hashing import hash_int64
        from osm_live_updates_ray.stages.similarity import (
            _kmeans_assign,
            kmeans_lloyd_quantized,
            kmeans_quantize,
        )

        k, iters = 4, 3
        cent, out = kmeans_lloyd_quantized(
            ray.data.read_parquet(f"{sf}/embeddings.parquet"),
            k=k, iters=iters,
        )
        # single-process reference with identical integer rules
        Q = kmeans_quantize(np.asarray(X, dtype=np.float64))
        h = hash_int64(ids).view(np.uint64)
        C = Q[np.argsort(h, kind="stable")[:k]].copy()
        for _ in range(iters):
            a = _kmeans_assign(Q, C)
            for c in range(k):
                m = a == c
                if m.any():
                    C[c] = Q[m].sum(axis=0) // int(m.sum())
        assert np.array_equal(cent, C)
        a = _kmeans_assign(Q, C)
        df = out.to_pandas().sort_values("vec_id")
        assert np.array_equal(df["cluster"].to_numpy(), a)
        diff = Q - C[a]
        assert np.array_equal(
            df["dist2"].to_numpy(), np.einsum("ij,ij->i", diff, diff)
        )


class TestWordCountsCms:
    def test_never_underestimates_and_merges(self, ray_session, tmp_path):
        texts = [
            "apple banana apple cherry",
            "banana banana durian elderberry fig",
            "apple grape grape grape",
        ]
        sf = _write_docs(tmp_path, texts)
        out = (
            QUERIES["word_counts_cms"](sf).set_index("word").sort_index()
        )
        # exact counts are right and the sketch NEVER underestimates
        assert out.loc["apple", "n_true"] == 3
        assert out.loc["grape", "n_true"] == 3
        assert (out["n_cms"] >= out["n_true"]).all()
        # linearity (mergeability): CMS(corpus) == CMS(half1)+CMS(half2),
        # so estimates from split writes match the single-table run
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        a = _write_docs(tmp_path / "a", texts[:2])
        b = _write_docs(tmp_path / "b", texts[2:], ids=[2])
        ca = QUERIES["word_counts_cms"](a).set_index("word")
        cb = QUERIES["word_counts_cms"](b).set_index("word")
        # a word seen in only one half has the same bucket row there;
        # summed sketch estimate >= merged-corpus estimate never breaks
        for w in out.index:
            s = int(ca["n_cms"].get(w, 0)) + int(cb["n_cms"].get(w, 0))
            assert s >= out.loc[w, "n_true"]
