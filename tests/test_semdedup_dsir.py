"""Round-4 continued: SemDeDup (cluster-local semantic dedup, Abbas
et al. 2023) and DSIR hashed-bigram importance weights (Xie et al.
2023).  The per-round oracle gate covers the SQL equivalence at three
sf tiers; these pin the operator SEMANTICS on planted inputs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osm_live_updates_ray.queries import QUERIES

T_SEMDEDUP = 360_000_000_000_000


def _write_emb(tmp_path, X, ids=None):
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


def _write_docs(tmp_path, texts, langs, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": langs,
        }),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


class TestSemdedup:
    def test_planted_copies_are_dropped_keep_first(self, ray_session,
                                                   tmp_path):
        rng = np.random.default_rng(7)
        base = rng.uniform(-0.5, 0.5, size=(40, 64))
        # every unique pair must sit OUTSIDE the threshold or the
        # "only planted copies are dups" assertion below is unsound
        Q = np.floor((base + 1) * (1 << 24)).astype(np.int64)
        G = Q @ Q.T
        n = np.diag(G)
        D = n[:, None] + n[None, :] - 2 * G
        iu = np.triu_indices(len(Q), 1)
        assert D[iu].min() > T_SEMDEDUP
        # plant exact copies of vectors 0..4 at ids 100..104
        X = np.vstack([base, base[:5]])
        ids = list(range(40)) + list(range(100, 105))
        sf = _write_emb(tmp_path, X, ids)
        out = QUERIES["semdedup"](sf).to_pandas().set_index("vec_id")
        assert len(out) == 45
        # the copy (larger id) is the dup; the original is kept
        for orig, copy in zip(range(5), range(100, 105)):
            assert bool(out.loc[copy, "is_dup"])
            assert not bool(out.loc[orig, "is_dup"])
            assert out.loc[copy, "cluster"] == out.loc[orig, "cluster"]
        assert int(out["is_dup"].sum()) == 5

    def test_dup_rule_is_cluster_local(self, ray_session, tmp_path):
        # two tight blobs far apart: within-blob pairs are near-dups,
        # across-blob pairs are not, regardless of cluster layout
        rng = np.random.default_rng(11)
        a = rng.uniform(-0.01, 0.01, size=(6, 16)) + 0.5
        b = rng.uniform(-0.01, 0.01, size=(6, 16)) - 0.5
        sf = _write_emb(tmp_path, np.vstack([a, b]))
        out = QUERIES["semdedup"](sf).to_pandas().set_index("vec_id")
        # each blob keeps exactly its min-id member (clusters can only
        # split a blob, never merge the two — they are far apart)
        kept = out.index[~out["is_dup"]].to_numpy()
        assert 0 in kept and 6 in kept
        for blob in (range(0, 6), range(6, 12)):
            blob_out = out.loc[list(blob)]
            per_cluster_min = blob_out.groupby("cluster").apply(
                lambda g: g.index.min()
            )
            for vid, row in blob_out.iterrows():
                assert bool(row["is_dup"]) == (
                    vid != per_cluster_min[row["cluster"]]
                )


class TestDsirImportance:
    def test_sign_and_additivity(self, ray_session, tmp_path):
        # 'alpha beta' appears only in the en (target) slice,
        # 'gamma delta' only in the raw-only slice
        texts = [
            "alpha beta",
            "alpha beta alpha beta",
            "gamma delta",
            "shared pair",
            "shared pair",
            "single",  # < 2 tokens: excluded
        ]
        langs = ["en", "en", "de", "en", "de", "en"]
        sf = _write_docs(tmp_path, texts, langs)
        out = QUERIES["dsir_importance"](sf).to_pandas().set_index("doc_id")
        assert 5 not in out.index
        assert out.loc[0, "dsir_logw"] > 0       # target-only feature
        assert out.loc[2, "dsir_logw"] < 0       # raw-only feature
        # weights are additive over features: doc 1 = 3 bigrams
        # ('alpha beta' x2 + the crossing 'beta alpha')
        assert out.loc[1, "n_bigrams"] == 3
        assert out.loc[0, "n_bigrams"] == 1
        # the en-vs-de doc with the SAME text differ only via totals
        # (same buckets), so their weights are equal
        assert out.loc[3, "dsir_logw"] == out.loc[4, "dsir_logw"]

    def test_weight_orders_target_likeness(self, ray_session, tmp_path):
        # a doc made of target-slice bigrams outranks a doc made of
        # raw-only bigrams under the same length
        texts = (
            ["good stuff here now"] * 4
            + ["bad junk there then"] * 4
            + ["good stuff here now", "bad junk there then"]
        )
        langs = ["en"] * 4 + ["de"] * 4 + ["fr", "fr"]
        sf = _write_docs(tmp_path, texts, langs)
        out = QUERIES["dsir_importance"](sf).to_pandas().set_index("doc_id")
        assert out.loc[8, "dsir_logw"] > out.loc[9, "dsir_logw"]


class TestAnnTopkPq:
    def test_self_is_exact_under_full_codebook(self, ray_session, tmp_path):
        # exactly 16 vectors => the sampled codebook IS the corpus, so
        # every vector encodes losslessly and its self-ADC is 0
        rng = np.random.default_rng(3)
        X = rng.uniform(-0.5, 0.5, size=(16, 64))
        sf = _write_emb(tmp_path, X)
        out = QUERIES["ann_topk_pq"](sf)
        first = out[out["rank"] == 1].set_index("query_id")
        for q in range(5):
            assert first.loc[q, "neighbor_id"] == q
            assert first.loc[q, "adc_dist2"] == 0

    def test_planted_copy_shares_the_code(self, ray_session, tmp_path):
        # a copy of query 0 at id 100 gets identical codes, hence an
        # identical ADC distance — both must occupy the top-2 ranks
        rng = np.random.default_rng(5)
        X = rng.uniform(-0.5, 0.5, size=(40, 64))
        X = np.vstack([X, X[:1]])
        ids = list(range(40)) + [100]
        sf = _write_emb(tmp_path, X, ids)
        out = QUERIES["ann_topk_pq"](sf)
        top2 = out[(out["query_id"] == 0) & (out["rank"] <= 2)]
        assert set(top2["neighbor_id"]) == {0, 100}
        assert top2["adc_dist2"].nunique() == 1


class TestBm25Topk:
    def test_tf_and_length_normalization(self, ray_session, tmp_path):
        texts = [
            "column filler filler",                            # tf 1, short
            "column filler filler filler filler filler",       # tf 1, long
            "column column filler",                            # tf 2, short
            "filler filler",                                   # no query term
            "window scan filler",                              # two terms
        ]
        langs = ["en"] * 5
        sf = _write_docs(tmp_path, texts, langs)
        out = QUERIES["bm25_topk"](sf).set_index("doc_id")
        assert 3 not in out.index                    # excluded, no term
        # more occurrences beat fewer; shorter beats longer at equal tf
        assert out.loc[2, "bm25"] > out.loc[0, "bm25"]
        assert out.loc[0, "bm25"] > out.loc[1, "bm25"]
        # ranks are dense from 1 and ordered by score
        assert sorted(out["rank"]) == list(range(1, len(out) + 1))


def _write_docs_src(tmp_path, texts, sources, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "source": sources,
        }),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


class TestDocTokensBpe:
    def test_counts_match_re2_semantics(self, ray_session, tmp_path):
        import re

        from osm_live_updates_ray.queries import _BPE_PAT

        texts = ["Hello world, it's 2026!  x9y", "foo_bar baz-qux 123", "a"]
        sf = _write_docs_src(tmp_path, texts, ["s"] * 3)
        out = (
            QUERIES["doc_tokens_bpe"](sf).to_pandas().set_index("doc_id")
        )
        for i, s in enumerate(texts):
            exp = len(re.findall(_BPE_PAT, s))
            assert out.loc[i, "n_bpe_tokens"] == exp
            assert out.loc[i, "n_ws_tokens"] == len(s.split(" "))
            assert abs(
                out.loc[i, "chars_per_token"] - round(len(s) / exp, 4)
            ) < 1e-9


class TestSourceOverlap:
    def test_planted_shared_shingles(self, ray_session, tmp_path):
        texts = ["x y z", "x y q", "p q", "x y z"]
        srcs = ["A", "B", "C", "A"]
        sf = _write_docs_src(tmp_path, texts, srcs)
        out = QUERIES["source_overlap"](sf).set_index(
            ["source_a", "source_b"]
        )
        # A = {xy, yz}, B = {xy, yq}, C = {pq}: only A-B intersect
        assert list(out.index) == [("A", "B")]
        assert out.loc[("A", "B"), "n_shared"] == 1
        assert abs(out.loc[("A", "B"), "jaccard"] - round(1 / 3, 4)) < 1e-9


class TestNearDupPagerank:
    def test_regular_fixpoint_and_isolated_base(self, ray_session, tmp_path):
        # three identical docs form a 3-clique (deg 2 each): the
        # integer iteration's fixpoint is exactly the 1e12 start
        # (r//2 summed over 2 in-edges restores r); isolated docs sit
        # at the 0.15e12 base untouched
        texts = ["the quick brown fox jumps over the lazy dog"] * 3 + [
            "completely different content one",
            "another unrelated document two",
        ]
        sf = _write_docs(tmp_path, texts, ["en"] * 5)
        out = (
            QUERIES["near_dup_pagerank"](sf).to_pandas().set_index("doc_id")
        )
        for i in range(3):
            assert out.loc[i, "pagerank"] == 1_000_000_000_000
        for i in (3, 4):
            assert out.loc[i, "pagerank"] == 150_000_000_000

    def test_matches_reference_iteration(self, ray_session, tmp_path):
        # engine ranks must equal an independent 5-step reference
        # iteration over the engine's own (tested) edge set
        rng = np.random.default_rng(17)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
        texts += [texts[0], texts[0][:-3] + " w0", texts[5]]
        sf = _write_docs(tmp_path, texts, ["en"] * len(texts))
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs

        pairs = dedup_docs.ngram_jaccard_pairs(
            rd.read_parquet(f"{sf}/documents.parquet",
                            columns=["doc_id", "text"]),
            threshold=0.8, k=5,
        ).to_pandas()
        assert len(pairs) >= 2
        a = pairs["id_a"].to_numpy(dtype=np.int64)
        b = pairs["id_b"].to_numpy(dtype=np.int64)
        src = np.concatenate([a, b]); dst = np.concatenate([b, a])
        nodes = np.unique(src)
        r = {int(n): 1_000_000_000_000 for n in nodes}
        deg = {int(n): int((src == n).sum()) for n in nodes}
        for _ in range(5):
            acc = dict.fromkeys(r, 0)
            for s, d in zip(src, dst):
                acc[int(d)] += r[int(s)] // deg[int(s)]
            r = {n: 150_000_000_000 + (85 * v) // 100
                 for n, v in acc.items()}
        out = (
            QUERIES["near_dup_pagerank"](sf).to_pandas().set_index("doc_id")
        )
        for n, v in r.items():
            assert out.loc[n, "pagerank"] == v
        others = set(out.index) - set(r)
        assert all(out.loc[i, "pagerank"] == 150_000_000_000 for i in others)


class TestDocWinnowing:
    @staticmethod
    def _brute(text, k=5, w=4):
        from osm_live_updates_ray.functions.hashing import (
            shingle_hashes_batch,
        )

        h, off = shingle_hashes_batch([text], k)
        h = h[off[0]:off[1]]
        sel = set()
        n = len(h)
        for s in range(max(n - w + 1, 1)):
            win = h[s:min(s + w, n)]
            m = win.min()
            sel.add(s + int(np.flatnonzero(win == m)[-1]))  # rightmost
        return h, sel

    def test_matches_bruteforce_reference(self, ray_session, tmp_path):
        rng = np.random.default_rng(23)
        texts = [
            "".join(rng.choice(list("abcdef "), size=int(n)))
            for n in rng.integers(1, 200, size=30)
        ] + ["ab", ""]  # short-doc and empty-doc paths
        sf = _write_docs(tmp_path, texts, ["en"] * len(texts))
        out = (
            QUERIES["doc_winnowing"](sf).to_pandas().set_index("doc_id")
        )
        for i, txt in enumerate(texts):
            h, sel = self._brute(txt)
            assert out.loc[i, "n_shingles"] == len(h)
            assert out.loc[i, "n_fp"] == len(sel)
            x = np.uint64(0)
            for p in sel:
                x ^= h[p]
            assert out.loc[i, "fp_xor"] == np.int64(x.view(np.int64))

    def test_shared_run_guarantee(self, ray_session, tmp_path):
        # winnowing guarantees any shared substring of length
        # >= w + k - 1 = 8 contributes a shared fingerprint
        shared = "zqxwvyutrsponml"
        a = "aaaa bbbb " + shared + " cccc dddd"
        b = "eeee ffff " + shared + " gggg hhhh"
        ha, sa = self._brute(a)
        hb, sb = self._brute(b)
        assert {int(ha[p]) for p in sa} & {int(hb[p]) for p in sb}


class TestAnnTopkIvfpq:
    def test_self_probed_and_exact_under_full_codebook(self, ray_session,
                                                       tmp_path):
        # 16 vectors: every vector is its own coarse centroid AND PQ
        # codeword; the nearest probed list is the query's own, so
        # rank 1 is the query itself with ADC 0
        rng = np.random.default_rng(29)
        X = rng.uniform(-0.5, 0.5, size=(16, 64))
        sf = _write_emb(tmp_path, X)
        out = QUERIES["ann_topk_ivfpq"](sf)
        first = out[out["rank"] == 1].set_index("query_id")
        for q in range(5):
            assert first.loc[q, "neighbor_id"] == q
            assert first.loc[q, "adc_dist2"] == 0

    def test_candidates_respect_probe_pruning(self, ray_session, tmp_path):
        import ray.data as rd

        from osm_live_updates_ray.stages.similarity import (
            _probe_lists_int,
            _stack,
            lsh_quantize,
            sampled_centroids,
        )

        rng = np.random.default_rng(31)
        X = rng.uniform(-0.5, 0.5, size=(60, 64))
        sf = _write_emb(tmp_path, X)
        out = QUERIES["ann_topk_ivfpq"](sf)
        ids = np.arange(60, dtype=np.int64)
        _, C = sampled_centroids(ids, X, 16)
        Cq = lsh_quantize(C)
        s = 2 * (lsh_quantize(X) @ Cq.T) - np.einsum(
            "ij,ij->i", Cq, Cq
        )[None, :]
        lst = np.argmax(s, axis=1)
        probe = _probe_lists_int(X[:5], C, 4)
        for _, row in out.iterrows():
            q, n = int(row["query_id"]), int(row["neighbor_id"])
            assert lst[n] in probe[q]  # pruning is real, not cosmetic
