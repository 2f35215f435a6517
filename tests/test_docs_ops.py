"""Dedup / similarity / multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

from osm_live_updates_ray.stages import dedup_docs, multimodal, similarity


def docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "the quick brown fox jumps over the lazy dog and runs away quick",  # near-dup of 0
        "completely different content about databases and query engines",
        "the quick brown fox jumps over the lazy dog and runs away fast",  # exact dup of 0
        "yet another unrelated string holding no similarity whatsoever",
        "completely different content about databases and query planners",  # near-dup of 2
    ]
    return pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts}
    )


class TestExactDedup:
    def test_keeps_min_id(self, ray_session):
        import ray.data as rd

        out = dedup_docs.dedup_exact(rd.from_arrow(docs_table())).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 4, 5]  # doc 3 deduped into 0

    def test_anti_join_branch_equals_broadcast(self, ray_session):
        """Planted HIGH-dup-rate corpus: broadcast_id_limit=0 forces the
        hash semi/anti-join escape hatch (VERDICT r3 item 4); survivors
        and drop-id sets must equal the broadcast path exactly."""
        import ray.data as rd

        rng = np.random.default_rng(7)
        base = [f"document body number {i} with shared filler text" for i in range(40)]
        # ~60% duplicates: every base text replicated 1-4x under fresh ids
        texts, ids = [], []
        nid = 0
        for i, t in enumerate(base):
            for _ in range(1 + int(rng.integers(0, 4))):
                texts.append(t)
                ids.append(nid)
                nid += 1
        tbl = pa.Table.from_pydict({"doc_id": ids, "text": texts})
        ds = rd.from_arrow(tbl).repartition(4)
        want = dedup_docs.dedup_exact(
            ds, broadcast_id_limit=10**9
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        got = dedup_docs.dedup_exact(
            ds, broadcast_id_limit=0
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want[got.columns])
        drop_b = dedup_docs.exact_drop_ids(ds, broadcast_id_limit=10**9)
        drop_j = dedup_docs.exact_drop_ids(ds, broadcast_id_limit=0)
        np.testing.assert_array_equal(drop_b, drop_j)
        assert len(drop_b) > 0


class TestMinhashLsh:
    def test_near_dups_found_and_verified(self, ray_session):
        import ray.data as rd

        docs = docs_table()
        cand = dedup_docs.minhash_candidate_pairs(rd.from_arrow(docs)).to_pandas()
        texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
        verified = dedup_docs.verify_pairs(cand, texts, threshold=0.7)
        pairs = {tuple(sorted((a, b))) for a, b in zip(verified["id_a"], verified["id_b"])}
        assert (0, 3) in pairs  # exact dup
        assert (0, 1) in pairs  # near dup
        assert (2, 5) in pairs
        assert not any({p[0], p[1]} == {0, 2} for p in pairs)

    def test_duplicate_doc_id_rows_never_self_pair(self, ray_session):
        # regression: duplicate doc_id rows in the input could co-bucket
        # a row with itself; jaccard(a,a)=1.0 passes any threshold and
        # verify_pairs_distributed never filters id_a == id_b
        import pyarrow as pa
        import ray.data as rd

        docs = docs_table()
        dup = pa.concat_tables([docs, docs.slice(0, 2)])  # ids 0,1 twice
        cand = dedup_docs.minhash_candidate_pairs(rd.from_arrow(dup)).to_pandas()
        assert not (cand["id_a"] == cand["id_b"]).any()
        pairs = {tuple(sorted((a, b))) for a, b in zip(cand["id_a"], cand["id_b"])}
        assert (0, 3) in pairs  # real dup still found

    def test_connected_components(self):
        import pandas as pd

        pairs = pd.DataFrame({"id_a": [0, 1, 2, 7], "id_b": [1, 3, 5, 8]})
        comp = dedup_docs.connected_components(pairs)
        c = dict(zip(comp["doc_id"], comp["component"]))
        assert c[0] == c[1] == c[3]
        assert c[2] == c[5]
        assert c[7] == c[8] and c[7] != c[0]


class TestSimhash:
    def test_near_dups(self, ray_session):
        import ray.data as rd

        out = dedup_docs.simhash_near_dups(rd.from_arrow(docs_table())).to_pandas()
        pairs = {tuple(sorted((a, b))) for a, b in zip(out["id_a"], out["id_b"])}
        assert (0, 3) in pairs  # identical text => hamming 0


class TestSimilarity:
    def vecs(self, n=50, d=16, seed=3):
        rng = np.random.RandomState(seed)
        X = rng.standard_normal((n, d)).astype(np.float32)
        return pa.Table.from_pydict(
            {
                "vec_id": list(range(n)),
                "embedding": [row.tolist() for row in X],
            },
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        )

    def test_brute_force_exact(self, ray_session):
        import ray.data as rd

        t = self.vecs()
        from osm_live_updates_ray.stages.similarity import _stack

        Q = _stack(t.slice(0, 2), "embedding")
        out = similarity.brute_force_topk(
            rd.from_arrow(t), np.array([0, 1]), Q, k=5
        )
        # oracle: numpy full matmul
        X = _stack(t, "embedding")
        for qi in (0, 1):
            s = X[qi] @ X.T
            order = np.lexsort((np.arange(len(s)), -s))[:5]
            got = out[out["query_id"] == qi]["neighbor_id"].tolist()
            assert got == order.tolist()
            assert out[out["query_id"] == qi]["rank"].tolist() == [1, 2, 3, 4, 5]

    def test_lsh_subset_of_bruteforce_domain(self, ray_session):
        import ray.data as rd

        t = self.vecs()
        from osm_live_updates_ray.stages.similarity import _stack

        Q = _stack(t.slice(0, 2), "embedding")
        out = similarity.lsh_bucketed_topk(
            rd.from_arrow(t), np.array([0, 1]), Q, k=5, n_planes=4
        )
        # each query at least finds itself (same bucket by definition)
        for qi in (0, 1):
            assert qi in out[out["query_id"] == qi]["neighbor_id"].tolist()

    def test_ivf_recall_vs_bruteforce(self, ray_session):
        import ray.data as rd

        t = self.vecs(n=200, d=16)
        from osm_live_updates_ray.stages.similarity import _stack

        Q = _stack(t.slice(0, 3), "embedding")
        qids = np.array([0, 1, 2])
        exact = similarity.brute_force_topk(rd.from_arrow(t), qids, Q, k=10)
        approx = similarity.ivf_topk(
            rd.from_arrow(t), qids, Q, k=10, nlist=8, nprobe=3,
            train_vecs=_stack(t, "embedding"),
        )
        # determinism: a rerun returns the identical frame
        approx2 = similarity.ivf_topk(
            rd.from_arrow(t), qids, Q, k=10, nlist=8, nprobe=3,
            train_vecs=_stack(t, "embedding"),
        )
        assert approx.equals(approx2)
        hits = total = 0
        for qi in qids:
            e = set(exact[exact["query_id"] == qi]["neighbor_id"])
            a = set(approx[approx["query_id"] == qi]["neighbor_id"])
            assert qi in a  # the query's own list is always probed
            hits += len(e & a)
            total += len(e)
        assert hits / total >= 0.5  # nprobe 3/8 of a random corpus


class TestMultimodal:
    def test_featurize_plumbing(self, ray_session):
        import ray.data as rd

        media = multimodal.gen_media(30)
        imgs = media.filter(pa.compute.equal(media.column("kind"), "image"))
        out = multimodal.featurize_images(rd.from_arrow(imgs)).to_pandas()
        assert len(out) == imgs.num_rows
        assert all(len(f) == 64 for f in out["feat"])
        assert (out["decoder_version"] == multimodal.ImageFeaturizer.VERSION).all()
        # determinism: same payload -> same features
        out2 = multimodal.featurize_images(rd.from_arrow(imgs)).to_pandas()
        a = np.array([np.array(f) for f in out.sort_values("media_id")["feat"]])
        b = np.array([np.array(f) for f in out2.sort_values("media_id")["feat"]])
        assert (a == b).all()

    def test_frame_sampler(self):
        media = multimodal.gen_media(9)
        vids = media.filter(pa.compute.equal(media.column("kind"), "video"))
        out = multimodal.FrameSampler(every_ms=1000)(vids)
        assert out.num_rows == vids.num_rows * 3  # 3000ms / 1000ms


class TestScaleSafeMinhash:
    def test_mega_bucket_chained_not_dropped(self, ray_session):
        """Buckets above the all-pairs cap emit a sorted chain of pairs
        (components still merge the group) instead of silently dropping."""
        import ray.data as rd

        # 300 identical docs land in the same LSH buckets (> 200 cap)
        n = 300
        t = pa.Table.from_pydict(
            {
                "doc_id": list(range(n)),
                "text": ["identical text for every single document here"] * n,
            }
        )
        cand = dedup_docs.minhash_candidate_pairs(rd.from_arrow(t)).to_pandas()
        assert len(cand) > 0  # NOT dropped
        comp = dedup_docs.connected_components(
            cand.assign(jaccard=1.0)
        )
        # the chain keeps the whole group connected
        assert comp["component"].nunique() == 1
        assert len(comp) == n

    def test_verify_distributed_equals_driver(self, ray_session):
        import ray.data as rd

        docs = docs_table()
        ds = rd.from_arrow(docs)
        cand_ds = dedup_docs.minhash_candidate_pairs(ds)
        cand = cand_ds.to_pandas()
        texts = dict(
            zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
        )
        want = dedup_docs.verify_pairs(cand, texts, threshold=0.7)
        got = (
            dedup_docs.verify_pairs_distributed(cand_ds, ds, threshold=0.7)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        want = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert list(got["id_a"]) == list(want["id_a"])
        assert list(got["id_b"]) == list(want["id_b"])
        assert np.allclose(got["jaccard"], want["jaccard"])

    def test_components_distributed_equals_driver(self, ray_session):
        import pandas as pd
        import ray.data as rd

        # two chains + an isolated pair
        pairs = pd.DataFrame(
            {"id_a": [1, 2, 3, 10, 20, 21], "id_b": [2, 3, 4, 11, 21, 22]}
        )
        want = (
            dedup_docs.connected_components(pairs)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            dedup_docs.connected_components_distributed(
                rd.from_pandas(pairs), num_partitions=1
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["component"]) == list(want["component"])


class TestCosineNearDup:
    def _emb(self, n=100, d=32, n_dups=15, seed=3):
        rng = np.random.RandomState(seed)
        X = rng.standard_normal((n, d))
        # planted near-dups: rows n..n+n_dups are tiny perturbations
        dup = X[:n_dups] + 0.02 * rng.standard_normal((n_dups, d))
        allX = np.vstack([X, dup])
        return pa.Table.from_pydict(
            {
                "vec_id": np.arange(len(allX), dtype=np.int64),
                "embedding": [row.astype(np.float32).tolist() for row in allX],
            }
        )

    def test_exact_finds_planted_dups(self, ray_session):
        import ray.data as rd

        t = self._emb()
        out = similarity.cosine_near_dups(
            rd.from_arrow(t).repartition(3), t, threshold=0.9
        ).to_pandas()
        got = {tuple(p) for p in out[["id_a", "id_b"]].to_numpy()}
        want = {(i, 100 + i) for i in range(15)}
        assert want <= got

    def test_lsh_recall_on_planted_dups(self, ray_session):
        import ray.data as rd

        t = self._emb()
        exact = similarity.cosine_near_dups(
            rd.from_arrow(t).repartition(3), t, threshold=0.9
        ).to_pandas()
        approx = similarity.cosine_near_dups_lsh(
            rd.from_arrow(t).repartition(3), threshold=0.9
        ).to_pandas()
        e = {tuple(p) for p in exact[["id_a", "id_b"]].to_numpy()}
        a = {tuple(p) for p in approx[["id_a", "id_b"]].to_numpy()}
        assert a <= e  # no false positives (verified in-bucket)
        assert len(a & e) / max(1, len(e)) >= 0.9  # high recall for near-dups


class TestAudioFeaturizer:
    def test_windowed_features_deterministic(self, ray_session):
        import ray.data as rd

        media = multimodal.gen_media(30)
        auds = media.filter(pa.compute.equal(media.column("kind"), "audio"))
        out = multimodal.featurize_audio(rd.from_arrow(auds)).to_pandas()
        assert len(out) == auds.num_rows
        assert (out["n_windows"] >= 1).all()
        assert all(
            len(f) == 13 * n for f, n in zip(out["mfcc"], out["n_windows"])
        )
        out2 = multimodal.featurize_audio(rd.from_arrow(auds)).to_pandas()
        a = [np.array(f) for f in out.sort_values("media_id")["mfcc"]]
        b = [np.array(f) for f in out2.sort_values("media_id")["mfcc"]]
        assert all((x == y).all() for x, y in zip(a, b))


class TestUnknownFormatNullRows:
    """Unrecognized payloads must surface as decode-failure NULL rows,
    never synthetic byte features (policy: functions/jpeg.py header)."""

    def test_image_unknown_payload_is_null_row(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        from osm_live_updates_ray.functions import media as _media

        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(8, 8))
        batch = pa.table({
            "media_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(
                [b"utf-8 text standing in for media bytes",
                 _media.encode_ppm(img)],
                type=pa.binary(),
            ),
        })
        out = fz(batch)
        feats = out.column("feat").to_pylist()
        assert feats[0] is None and feats[1] is not None
        assert out.column("out_width").to_pylist()[0] is None

    def test_audio_unknown_payload_is_null_row(self):
        fz = multimodal.AudioFeaturizer()
        batch = pa.table({
            "media_id": pa.array([7], type=pa.int64()),
            "payload": pa.array([b"not riff at all"], type=pa.binary()),
        })
        out = fz(batch)
        assert out.column("mfcc").to_pylist() == [None]
        assert out.column("n_windows").to_pylist() == [None]


class TestNgramJaccardJoin:
    def test_equals_brute_force(self, ray_session):
        """The prefix-filtered similarity join (AllPairs/PPJoin) finds
        EXACTLY the brute-force pair set — completeness of the
        (df, hash, sh) prefix order plus the length and positional
        filters, and jaccard values match the set formula."""
        import itertools

        import ray.data as rd

        from osm_live_updates_ray.functions import hashing

        rng = np.random.RandomState(7)
        vocab = [f"w{i:03d}" for i in range(60)]
        texts = []
        for _ in range(40):
            texts.append(" ".join(rng.choice(vocab, size=25)))
        for i in range(12):  # planted near-dups: one word swapped
            base = texts[i].split()
            base[rng.randint(len(base))] = rng.choice(vocab)
            texts.append(" ".join(base))
        t = pa.Table.from_pydict({"doc_id": list(range(len(texts))), "text": texts})

        got = (
            dedup_docs.ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.7, k=5)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

        sets = {d: set(hashing.shingles(s, 5)) for d, s in zip(range(len(texts)), texts)}
        want = []
        for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
            u = len(sa | sb)
            j = len(sa & sb) / u if u else 1.0
            if j >= 0.7:
                want.append((a, b, j))
        assert len(want) >= 12  # the planted dups are found by brute force
        assert list(got["id_a"]) == [w[0] for w in want]
        assert list(got["id_b"]) == [w[1] for w in want]
        assert np.allclose(got["jaccard"], [w[2] for w in want], rtol=0, atol=0)

        # forced-tiny hot_df cap: the broadcast df dict keeps only 7
        # shingles (everything else defaults df=1), proving exactness
        # is CAP-INDEPENDENT — the prefix order stays a pure total
        # function of the shingle, so the identical pair set falls out
        capped = (
            dedup_docs.ngram_jaccard_pairs(
                rd.from_arrow(t), threshold=0.7, k=5, hot_df_cap=7
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        assert capped.equals(got)

    def test_hot_shingles_leave_prefixes(self):
        """Frequency-ordered prefixes push ubiquitous shingles OUT of the
        index: a shingle every doc shares must not become a mega-bucket."""
        t = pa.Table.from_pydict(
            {
                "doc_id": list(range(30)),
                "text": [
                    # long shared head + a unique tail WIDER than the
                    # prefix length, so a frequency-ordered prefix can
                    # consist entirely of rare shingles
                    f"common prefix shared by all docs variant "
                    f"tok{i:02d} mark{i:02d} tail{i:02d}"
                    for i in range(30)
                ],
            }
        )
        hot = {}
        from osm_live_updates_ray.functions import hashing

        for s in t.column("text").to_pylist():
            for sh in set(hashing.shingles(s, 5)):
                hot[sh] = hot.get(sh, 0) + 1
        # _shingle_prefix_rows keys its broadcast df dict by the
        # 64-bit shingle HASH (the hash-only exchange), not the string
        hot_by_hash = dict(zip(
            (int(h) for h in hashing.hash_strings(list(hot))),
            hot.values(),
        ))
        rows = dedup_docs._shingle_prefix_rows(
            t, hot_by_hash, "doc_id", "text", threshold=0.8, k=5
        ).to_pandas()
        df_of = rows["sh"].map(hot)
        # every doc's prefix consists of its RAREST shingles
        assert df_of.max() < 30


class TestSlidingWindow:
    def test_events_sliding_equals_bruteforce(self, ray_session):
        """The searchsorted sliding-window kernel must equal a per-row
        brute-force trailing-hour scan (RANGE semantics: ties on ts are
        peers, both frame ends inclusive)."""
        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = (
            queries.QUERIES["events_sliding"](sf)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "ts", "event_type", "value"])
        H = pd.Timedelta(hours=1)
        n_exp, s_exp = [], []
        for _, r in ev.iterrows():
            m = (ev["event_type"] == r["event_type"]) & \
                (ev["ts"] >= r["ts"] - H) & (ev["ts"] <= r["ts"])
            n_exp.append(int(m.sum()))
            s_exp.append(float(ev.loc[m, "value"].sum()))
        ev = ev.assign(n=n_exp, s=s_exp).sort_values("event_id")
        assert got["n_1h"].tolist() == ev["n"].tolist()
        assert np.allclose(got["sum_1h"].to_numpy(), np.round(ev["s"], 2),
                           atol=1e-9)


class TestTemporalJoins:
    """AS-OF and banded range join vs per-row brute force (the DuckDB
    oracle covers SQL parity; these pin the kernel semantics on edge
    placement: <= for as-of, [ts, ts+W) for the range window)."""

    def test_asof_equals_bruteforce(self, ray_session):
        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = (
            queries.QUERIES["events_asof"](sf)
            .to_pandas()
            .sort_values("purchase_id")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(f"{sf}/events.parquet")
        p = ev[ev["event_type"] == "purchase"]
        v = ev[ev["event_type"] == "view"]
        rows = []
        for _, r in p.iterrows():
            cand = v[(v["user_id"] == r["user_id"]) & (v["ts"] <= r["ts"])]
            if not len(cand):
                continue  # inner semantics
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            rows.append(
                (r["event_id"], best["event_id"], best["value"],
                 int((r["ts"] - best["ts"]).value // 1000))
            )
        exp = pd.DataFrame(
            rows, columns=["purchase_id", "prior_view_id",
                           "prior_view_value", "gap_us"]
        ).sort_values("purchase_id").reset_index(drop=True)
        assert got["purchase_id"].tolist() == exp["purchase_id"].tolist()
        assert got["prior_view_id"].tolist() == exp["prior_view_id"].tolist()
        assert got["gap_us"].tolist() == exp["gap_us"].tolist()
        assert np.allclose(got["prior_view_value"], exp["prior_view_value"])

    def test_range_join_equals_bruteforce(self, ray_session):
        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = (
            queries.QUERIES["events_range_join"](sf)
            .to_pandas()
            .sort_values("incident_id")
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(f"{sf}/events.parquet")
        e = ev[ev["event_type"] == "error"]
        c = ev[ev["event_type"] == "click"]
        W = pd.Timedelta(minutes=10)
        rows = []
        for _, r in e.iterrows():
            m = (c["ts"] >= r["ts"]) & (c["ts"] < r["ts"] + W)
            if not m.any():
                continue  # inner semantics
            rows.append((r["event_id"], int(m.sum()),
                         round(float(c.loc[m, "value"].sum()), 2)))
        exp = pd.DataFrame(
            rows, columns=["incident_id", "n_probes", "probe_value"]
        ).sort_values("incident_id").reset_index(drop=True)
        assert got["incident_id"].tolist() == exp["incident_id"].tolist()
        assert got["n_probes"].tolist() == exp["n_probes"].tolist()
        assert np.allclose(got["probe_value"], exp["probe_value"], atol=1e-9)

    def test_range_join_band_straddle(self, ray_session):
        """A window that straddles a band boundary must count probes
        from BOTH bands exactly once (the <=2-replica invariant)."""
        import ray.data as rd

        from osm_live_updates_ray.stages import temporal

        W = 600_000_000  # 10 min in us
        base = np.int64(1_700_000_000_000_000)
        # align so the window [start, start+W) crosses a band edge
        start = (base // W) * W + W - 120_000_000  # 2 min before the edge
        win = pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([start], pa.int64()).cast(pa.timestamp("us")),
        })
        # probes: one in the same band, one past the edge (in-window),
        # one past the window end, one before the start
        pts = [start + 60_000_000, start + 300_000_000,
               start + W, start - 1]
        probes = pa.table({
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            "ts": pa.array(pts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([1.25, 2.5, 100.0, 100.0]),
        })
        out = temporal.banded_range_join(
            rd.from_arrow(win), rd.from_arrow(probes), window_us=W
        ).to_pandas()
        assert len(out) == 1
        assert int(out["n_probes"].iloc[0]) == 2
        assert int(out["cents"].iloc[0]) == 375


class TestRealMediaDecode:
    """The uncompressed-format decode paths are REAL (numpy + stdlib):
    round-trips and known-pixel checks, no imaging libraries."""

    def test_ppm_roundtrip(self):
        from osm_live_updates_ray.functions import media

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
        assert (media.decode_ppm(media.encode_ppm(img)) == img).all()

    def test_ppm_header_comment(self):
        from osm_live_updates_ray.functions import media

        img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        raw = media.encode_ppm(img)
        commented = b"P6\n# a comment\n2 2\n255\n" + raw.split(b"\n", 3)[3]
        assert (media.decode_ppm(commented) == img).all()

    def test_bmp_24bit_decode(self):
        import struct

        from osm_live_updates_ray.functions import media

        # handcraft a 2x2 bottom-up 24-bit BMP: rows padded to 4 bytes
        px = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]],
            dtype=np.uint8,
        )  # RGB, top-down truth
        rows = b""
        for y in (1, 0):  # bottom-up storage
            row = b""
            for x in range(2):
                r, g, b = px[y, x]
                row += bytes([b, g, r])  # BGR
            rows += row + b"\x00" * ((4 - len(row) % 4) % 4)
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        hdr += struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                           len(rows), 0, 0, 0, 0)
        assert (media.decode_bmp(hdr + rows) == px).all()

    def test_wav_roundtrip(self):
        from osm_live_updates_ray.functions import media

        x = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
        y, rate = media.decode_wav(media.encode_wav(x, rate=8000))
        assert rate == 8000
        assert np.allclose(y, x / 32768.0, atol=1e-6)

    def test_ppmv_frame_seek(self):
        from osm_live_updates_ray.functions import media

        frames = [np.full((3, 3, 3), i * 10, dtype=np.uint8) for i in range(5)]
        payload = media.encode_ppmv(frames, frame_ms=250)
        assert media.ppmv_info(payload) == (5, 250)
        for i in (0, 2, 4):
            assert (media.decode_ppmv_frame(payload, i) == frames[i]).all()

    def test_image_featurizer_uses_real_pixels(self, ray_session):
        """A constant-color PPM must produce the projection of a
        constant vector — proving the feature came from decoded pixels,
        not payload bytes."""
        fz = multimodal.ImageFeaturizer(out_dim=8, resize=(16, 16))
        img = np.full((10, 10, 3), 200, dtype=np.uint8)
        from osm_live_updates_ray.functions import media

        t = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([media.encode_ppm(img)], pa.binary()),
        })
        out = fz(t)
        expected = fz.proj @ np.full(8, 200 / 255.0, dtype=np.float32)
        got = np.array(out.column("feat").to_pylist()[0], dtype=np.float32)
        assert np.allclose(got, expected, rtol=1e-5)

    def test_frame_sampler_extracts_right_frame(self, ray_session):
        from osm_live_updates_ray.functions import media

        frames = [np.full((4, 4, 3), i, dtype=np.uint8) for i in range(6)]
        payload = media.encode_ppmv(frames, frame_ms=500)
        t = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "duration_ms": pa.array([3000], pa.int32()),
            "payload": pa.array([payload], pa.binary()),
        })
        out = multimodal.FrameSampler(every_ms=1000)(t)
        assert out.num_rows == 3  # t = 0, 1000, 2000
        for row, t_ms in zip(range(3), (0, 1000, 2000)):
            blob = out.column("frame_stub")[row].as_py()
            idx = t_ms // 500
            assert (media.decode_ppm(blob) == frames[idx]).all()

    def test_compressed_decode_gated(self):
        # PNG/JPEG/GIF decode natively; the PIL gate remains for
        # formats without a native path (e.g. WebP) — such payloads
        # must surface NotImplementedError in this container;
        # malformed PNG/JPEG/GIF raise ValueError, not a crash
        from osm_live_updates_ray.functions import media

        with pytest.raises(NotImplementedError):
            media.decode_image(b"RIFFxxxxWEBPVP8 rest-of-webp")
        with pytest.raises(ValueError):
            media.decode_image(b"GIF89a")  # truncated header
        with pytest.raises(ValueError):
            media.decode_image(b"\xff\xd8\xff\xe0rest-of-jpeg")  # no SOF/SOS
        with pytest.raises(ValueError):
            media.decode_image(b"\x89PNG\r\n\x1a\nrest")


class TestTextCorpusOps:
    """word_counts / doc_repetition / tfidf_top_term vs per-doc Counter
    brute force (the DuckDB oracle covers SQL parity; these pin the
    vectorized kernels' semantics: split on single space, rounding
    half-away-from-zero, argmax tie broken by term text)."""

    def test_word_counts_equals_counter(self, ray_session):
        from collections import Counter

        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = queries.QUERIES["word_counts"](sf).to_pandas()
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        exp = Counter()
        for t in docs["text"]:
            exp.update(t.split(" "))
        assert dict(zip(got["word"], got["n"])) == dict(exp)

    def test_doc_repetition_equals_counter(self, ray_session):
        from collections import Counter

        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = (
            queries.QUERIES["doc_repetition"](sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        assert got["doc_id"].tolist() == docs["doc_id"].tolist()
        for i, t in enumerate(docs["text"]):
            c = Counter(t.split(" "))
            n = sum(c.values())
            assert got.loc[i, "n_words"] == n
            assert got.loc[i, "n_distinct_words"] == len(c)
            assert abs(got.loc[i, "dup_word_frac"] - (1 - len(c) / n)) < 5e-5
            assert abs(got.loc[i, "top_word_frac"] - max(c.values()) / n) < 5e-5

    def test_tfidf_top_term_equals_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import pandas as pd

        from osm_live_updates_ray import queries

        sf = "/root/testdata/sf0.001"
        got = (
            queries.QUERIES["tfidf_top_term"](sf)
            .to_pandas()
            .set_index("doc_id")
        )
        docs = pd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        dfreq = Counter()
        per_doc = {}
        for _, r in docs.iterrows():
            c = Counter(r["text"].split(" "))
            per_doc[r["doc_id"]] = c
            dfreq.update(c.keys())
        n = float(len(docs))
        for doc_id, c in per_doc.items():
            scored = sorted(
                ((round(tf * math.log(n / dfreq[w]), 4), w) for w, tf in c.items()),
                key=lambda sw: (-sw[0], sw[1]),
            )
            s, w = scored[0]
            assert got.loc[doc_id, "top_term"] == w
            assert abs(got.loc[doc_id, "score"] - s) < 5e-5


class TestIncrementalDedup:
    """Persisted-fingerprint-index dedup: a new window checked against
    the accepted corpus without scanning it (dedup_docs.build_hash_index
    / incremental_dedup / update_hash_index)."""

    def _docs(self, ids, texts):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        )

    def test_cross_window_and_in_window_dups(self, ray_session, tmp_path):
        from osm_live_updates_ray.stages import dedup_docs

        idx = str(tmp_path / "idx")
        dedup_docs.build_hash_index(
            self._docs([0, 1, 2], ["alpha", "beta", "gamma"]), idx
        )
        # window: 10 dups an indexed text, 11/13 dup each other, 12 fresh
        win = self._docs([13, 12, 11, 10], ["delta", "epsilon", "delta", "beta"])
        out = dedup_docs.incremental_dedup(win, idx).to_pandas()
        assert sorted(out["doc_id"]) == [11, 12]  # min-id wins in-window

        # accepting the survivors and replaying the SAME window -> empty
        surv = dedup_docs.incremental_dedup(win, idx)
        dedup_docs.update_hash_index(surv, idx)
        again = dedup_docs.incremental_dedup(win, idx).to_pandas()
        assert len(again) == 0

        # membership keeps working after the append
        third = dedup_docs.incremental_dedup(
            self._docs([20, 21], ["delta", "zeta"]), idx
        ).to_pandas()
        assert sorted(third["doc_id"]) == [21]

    def test_window_shard_reads_one_part(self, tmp_path):
        import numpy as np

        from osm_live_updates_ray.stages import dedup_docs

        # every fingerprint must land in the part its group reads
        import pyarrow as pa
        t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                      "text": pa.array([f"doc {i}" for i in range(100)])})
        ft = dedup_docs._fingerprint_and_part(t, "text", 64)
        fp = ft.column("fp").to_numpy()
        part = ft.column("part").to_numpy()
        assert (fp.view(np.uint64) % np.uint64(64) == part.view(np.uint64)).all()


class TestIvfPersisted:
    def test_persisted_equals_streaming(self, ray_session, tmp_path):
        """Read-pruned persisted IVF must return IDENTICAL rows to the
        streaming variant with the same quantizer (assignment is
        recomputed from the same centroids, so the candidate sets and
        scores match exactly)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.stages import similarity as sim

        rng = np.random.RandomState(3)
        n, d = 2000, 16
        X = rng.randn(n, d)
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in X.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
        })
        qi = np.arange(5, dtype=np.int64)
        Q = sim._stack(t.slice(0, 5), "embedding")
        train = sim._stack(t, "embedding")
        streaming = sim.ivf_topk(
            rd.from_arrow(t), qi, Q, k=10, nlist=8, nprobe=3, train_vecs=train
        )
        idx = str(tmp_path / "ivf")
        sim.ivf_build_index(rd.from_arrow(t), idx, nlist=8, train_vecs=train)
        persisted = sim.ivf_topk_persisted(idx, qi, Q, k=10, nprobe=3)
        import pandas as pd
        pd.testing.assert_frame_equal(
            streaming.reset_index(drop=True), persisted.reset_index(drop=True)
        )
        # the probed read really prunes: fewer files than lists exist
        import glob
        all_lists = glob.glob(f"{idx}/list=*")
        assert len(all_lists) > 3  # corpus spread over multiple lists


class TestShuffleShards:
    def test_positions_are_a_permutation(self, ray_session):
        from osm_live_updates_ray import queries

        out = (
            queries.QUERIES["doc_shuffle_shards"]("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("pos")
        )
        n = len(out)
        assert out["pos"].tolist() == list(range(n))
        assert (out["shard"].to_numpy() == out["pos"].to_numpy() // 100).all()
        # content-hash order is a real shuffle: not doc_id order
        assert out["doc_id"].tolist() != sorted(out["doc_id"].tolist())


class TestLshOracleExactness:
    """The LSH entries are APPROXIMATE yet oracled: the splitmix64
    Rademacher planes + int64 fixed-point quantization make the bucket
    keys integer-exact, so the SQL mirror must reproduce them bit for
    bit.  This pins the numpy-kernel <-> DuckDB equality directly (the
    per-round gate then pins the full pipelines)."""

    def test_sql_bucket_keys_equal_numpy(self):
        import duckdb

        from osm_live_updates_ray.queries import _lsh_prefix_sql
        from osm_live_updates_ray.stages.similarity import (
            LSH_SALT_PAIRS, LSH_SALT_TOPK, lsh_plane_signs, lsh_quantize)

        import pyarrow.parquet as pq

        sf = "/root/testdata/sf0.001"
        t = pq.read_table(f"{sf}/embeddings.parquet")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()])
        ids = t.column("vec_id").to_numpy()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')"
        )
        # single-table top-k keys (8 planes)
        signs = lsh_plane_signs(X.shape[1], 8, LSH_SALT_TOPK)
        knp = ((lsh_quantize(X) @ signs > 0).astype(np.uint32)
               << np.arange(8, dtype=np.uint32)).sum(axis=1)
        df = con.execute(
            f"WITH {_lsh_prefix_sql(8, LSH_SALT_TOPK)}, keys AS ("
            "SELECT vec_id, SUM(CASE WHEN dot > 0 THEN 1 << c ELSE 0 END)"
            " AS key FROM dots GROUP BY vec_id) SELECT * FROM keys"
        ).df()
        m = dict(zip(df.vec_id, df.key))
        assert all(int(m[i]) == int(k) for i, k in zip(ids, knp))
        # multi-table near-dup keys (8 tables x 4 planes)
        signs2 = lsh_plane_signs(X.shape[1], 32, LSH_SALT_PAIRS)
        sig = (lsh_quantize(X) @ signs2 > 0).astype(np.uint32)
        df2 = con.execute(
            f"WITH {_lsh_prefix_sql(32, LSH_SALT_PAIRS)}, keys AS ("
            "SELECT vec_id, c // 4 AS t, SUM(CASE WHEN dot > 0 THEN"
            " 1 << (c % 4) ELSE 0 END) AS key FROM dots"
            " GROUP BY vec_id, t) SELECT * FROM keys"
        ).df()
        km = {(int(r.vec_id), int(r.t)): int(r.key)
              for r in df2.itertuples()}
        for vi, i in enumerate(ids):
            for b in range(8):
                sub = sig[vi, b * 4:(b + 1) * 4]
                k = int((sub << np.arange(4, dtype=np.uint32)).sum())
                assert km[(int(i), b)] == k

    def test_plane_signs_deterministic_and_balanced(self):
        from osm_live_updates_ray.stages.similarity import lsh_plane_signs

        a = lsh_plane_signs(64, 8, 12345)
        b = lsh_plane_signs(64, 8, 12345)
        assert (a == b).all() and set(np.unique(a)) == {-1, 1}
        # splitmix64 low bit is uniform: signs roughly balanced
        frac = (a == 1).mean()
        assert 0.35 < frac < 0.65
        with pytest.raises(ValueError):
            lsh_plane_signs(300, 8, 1)


class TestSampledIvf:
    def test_sampled_ivf_subset_and_deterministic(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(3)
        X = rng.standard_normal((200, 16))
        t = pa.table({
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in X],
                                  type=pa.list_(pa.float32())),
        })
        from osm_live_updates_ray.stages.similarity import (
            _stack, ivf_topk_sampled, sampled_centroids)

        ids = t.column("vec_id").to_numpy()
        V = _stack(t, "embedding")
        cids, C = sampled_centroids(ids, V, 8)
        # centroid ids ascending, vectors are the ids' own rows
        assert (np.diff(cids) > 0).all()
        assert all((C[i] == V[int(c)]).all() for i, c in enumerate(cids))
        Q = V[:3]
        a = ivf_topk_sampled(rd.from_arrow(t), np.arange(3), Q, ids, V,
                             k=5, nlist=8, nprobe=3)
        b = ivf_topk_sampled(rd.from_arrow(t).repartition(4), np.arange(3),
                             Q, ids, V, k=5, nlist=8, nprobe=3)
        assert a.equals(b)  # partitioning-invariant
        # each query finds itself (its own list is always probed first)
        for qi in range(3):
            assert qi in a[a["query_id"] == qi]["neighbor_id"].tolist()


class TestQ21PathEquality:
    def test_broadcast_equals_join_path(self, ray_session):
        """tpch_q21's shape switch (broadcast F-order probe vs Dataset
        joins) must be invisible in the result."""
        import pandas as pd

        from osm_live_updates_ray import queries as Q

        sf = "/root/testdata/sf0.001"
        rd = Q._rd()
        from ray.data.aggregate import Count

        li = rd.read_parquet(f"{sf}/lineitem.parquet",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_shipdate"])
        a = Q._q21_broadcast_path(rd, li, sf, Count)
        b = Q._q21_join_path(rd, li, sf, Count)
        a = a.sort_values(["l_suppkey"]).reset_index(drop=True)
        b = b.sort_values(["l_suppkey"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.astype({"l_suppkey": "int64", "count()": "int64"}),
            b.astype({"l_suppkey": "int64", "count()": "int64"}),
        )
        assert len(a) > 0  # non-trivial at this tier


class TestQ8Q9PathEquality:
    def test_broadcast_equals_join_paths(self, ray_session):
        """The q8/q9 shape switch (broadcast order probe below the 2M
        gate vs fact-fact Dataset join above) must be invisible."""
        import pandas as pd

        from osm_live_updates_ray.queries import tpch_q8, tpch_q9

        sf = "/root/testdata/sf0.001"
        for fn in (tpch_q8, tpch_q9):
            a = fn(sf).reset_index(drop=True)
            b = fn(sf, _force_join=True).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)
            assert len(a) > 0

    def test_q7_broadcast_equals_join(self, ray_session):
        """q7's gate (added after the sf0.001 sweep hit Ray 2.49.2's
        empty-left-partition hash-join defect).  Equality is checked at
        sf0.01: q7 is empty at sf0.001, where the forced join path
        would also re-trigger the upstream defect."""
        import pandas as pd

        from osm_live_updates_ray.queries import tpch_q7

        sf = "/root/testdata/sf0.01"
        a = tpch_q7(sf).reset_index(drop=True)
        b = tpch_q7(sf, _force_join=True).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0


class TestTriangles:
    def _known(self):
        import pandas as pd

        # K4 on {1,2,3,4} (4 triangles, each node in 3), a K3 on
        # {10,11,12} with pendant 13, and a triangle-free chain
        # {20,21,22}
        e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (10, 11), (10, 12), (11, 12), (12, 13),
             (20, 21), (21, 22)]
        return pd.DataFrame({"id_a": [x for x, _ in e],
                             "id_b": [y for _, y in e]})

    def test_driver_counts_known_graph(self):
        got = dedup_docs.triangle_counts(self._known())
        want = {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}
        assert dict(zip(got["doc_id"], got["triangles"])) == want

    def test_empty_and_triangle_free(self):
        import pandas as pd

        assert len(dedup_docs.triangle_counts(
            pd.DataFrame({"id_a": [], "id_b": []}))) == 0
        chain = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [2, 3, 4]})
        assert len(dedup_docs.triangle_counts(chain)) == 0

    def test_distributed_equals_driver(self, ray_session):
        import pandas as pd
        import ray.data as rd

        rng = np.random.RandomState(7)
        # random graph dense enough to have many triangles + the
        # known structures; few buckets so buckets mix edge families
        m = rng.randint(0, 40, size=(120, 2))
        m = m[m[:, 0] != m[:, 1]]
        a, b = np.minimum(m[:, 0], m[:, 1]), np.maximum(m[:, 0], m[:, 1])
        pairs = pd.DataFrame({"id_a": a, "id_b": b}).drop_duplicates()
        pairs = pd.concat([pairs, self._known()], ignore_index=True)
        want = (dedup_docs.triangle_counts(pairs)
                .sort_values("doc_id").reset_index(drop=True))
        got = (
            dedup_docs.triangle_counts_distributed(
                rd.from_pandas(pairs), num_buckets=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["triangles"]) == list(want["triangles"])


class TestKeepBest:
    def test_longest_wins_ties_to_min_id(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries

        # distinct-word bases so DISTINCT shingle counts track text
        # length (a repeated-base fixture collapses to few shingles
        # and silently reshapes the dup graph)
        base_a = " ".join(f"alpha{i}word" for i in range(60))
        base_b = " ".join(f"omega{i}term" for i in range(60))
        rows = [
            # cluster {1,2,3}: 2 is longest -> kept
            (1, base_a, "en", "web"),
            (2, base_a + " with an extra closing sentence", "en", "web"),
            (3, base_a + " tail", "en", "web"),
            # cluster {4,5}: identical texts -> tie -> min id 4 kept
            (4, base_b + " second family of copies", "en", "web"),
            (5, base_b + " second family of copies", "en", "web"),
            # singleton
            (6, "completely unrelated tiny text", "en", "web"),
        ]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows],
                                type=pa.int64()),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (queries.QUERIES["near_dup_keep_best"](str(tmp_path))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        kept = dict(zip(out["doc_id"], out["kept"]))
        comp = dict(zip(out["doc_id"], out["component"]))
        assert kept == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1}
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[4] == comp[5] == 4
        assert comp[6] == 6
        # sanity on the planted graph: both clusters really pass the
        # 0.8 Jaccard bar and the two bases do NOT cross-link
        assert comp[1] != comp[4]

    def test_exactly_one_kept_per_component(self, ray_session):
        from osm_live_updates_ray import queries

        out = queries.QUERIES["near_dup_keep_best"](
            "/root/testdata/sf0.001").to_pandas()
        per = out.groupby("component")["kept"].sum()
        assert (per == 1).all()
        assert len(out) == out["doc_id"].nunique()


class TestAnnRecallEval:
    def test_full_probe_gives_perfect_recall(self, ray_session):
        import ray.data as rd

        from osm_live_updates_ray.stages.similarity import (
            brute_force_topk, ivf_topk_sampled)

        rng = np.random.RandomState(11)
        X = rng.standard_normal((200, 16)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in X],
                                  type=pa.list_(pa.float32())),
        })
        ds = rd.from_arrow(t)
        qids = np.arange(3, dtype=np.int64)
        Q = X[:3].astype(np.float64)
        ids = np.arange(200, dtype=np.int64)
        exact = brute_force_topk(ds, qids, Q, k=10)
        # nprobe == nlist: the candidate set is the whole corpus, so
        # the IVF ranking must equal brute force -> recall 1.0
        ivf = ivf_topk_sampled(ds, qids, Q, ids, X.astype(np.float64),
                               k=10, nlist=8, nprobe=8)
        for qid in qids:
            es = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
            vs = set(ivf.loc[ivf["query_id"] == qid, "neighbor_id"])
            assert es == vs


class TestPhashDedup:
    def _noise(self, seed, w=16, h=12):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)

    def test_dhash_invariant_to_encoding_and_brightness(self):
        from osm_live_updates_ray.functions import media as _media

        img = self._noise(5)
        h0 = multimodal.dhash64(img)
        # same pixels through different PNG filters decode identically
        for ft in range(5):
            dec = _media.decode_image(_media.encode_png(img, filter_type=ft))
            assert multimodal.dhash64(dec) == h0
        # uniform brightness shift flips no comparison bits
        shifted = np.clip(img.astype(np.int16) + 20, 0, 255).astype(np.uint8)
        assert multimodal.dhash64(shifted) == h0

    def test_dhash_separates_textures(self):
        hashes = {multimodal.dhash64(self._noise(s)) for s in range(40)}
        assert len(hashes) == 40

    def test_entry_planted_copies_collapse(self, ray_session):
        from osm_live_updates_ray import queries

        out = queries.QUERIES["image_dedup_phash"](
            "/root/testdata/sf0.001").to_pandas()
        copies = out[out["media_id"] >= 1_000_000_000]
        orig = out[out["media_id"] < 1_000_000_000]
        assert len(copies) > 0
        assert (copies["is_dup"] == 1).all()
        assert (copies["group_min"]
                == copies["media_id"] - 1_000_000_000).all()
        assert (orig["is_dup"] == 0).all()


class TestHashEmbed:
    def test_matches_per_row_reference(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries
        from osm_live_updates_ray.functions import hashing

        texts = ["alpha beta gamma", "beta beta", "", "one two three four",
                 "alpha  double space"]
        t = pa.table({
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (queries.QUERIES["doc_hash_embed"](str(tmp_path))
               .to_pandas().sort_values(["doc_id", "dim"])
               .reset_index(drop=True))
        # naive per-row reference: split on single space (empties kept)
        want = {}
        for did, tx in enumerate(texts):
            v = np.zeros(16, dtype=np.int64)
            for w in tx.split(" "):
                h = int(hashing.hash_strings_poly([w]).view(np.uint64)[0])
                v[h % 16] += 1 - 2 * ((h >> 4) & 1)
            want[did] = v
        for did in range(5):
            got = out[out["doc_id"] == did]["val"].to_numpy()
            assert (got == want[did]).all(), did
        assert len(out) == 5 * 16


class TestHashEmbedSearch:
    def test_matches_naive_integer_ranking(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries
        from osm_live_updates_ray.functions import hashing

        rng = np.random.RandomState(19)
        vocab = [f"tok{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 20)))
                 for _ in range(40)]
        t = pa.table({
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "text": pa.array(texts),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = queries.QUERIES["hash_embed_search"](str(tmp_path))

        def emb(tx):
            v = np.zeros(16, dtype=np.int64)
            for w in tx.split(" "):
                h = int(hashing.hash_strings_poly([w]).view(np.uint64)[0])
                v[h % 16] += 1 - 2 * ((h >> 4) & 1)
            return v
        M = np.stack([emb(tx) for tx in texts])
        for qid in range(5):
            s = M @ M[qid]
            order = np.lexsort((np.arange(40), -s))[:10]
            got = out[out["query_id"] == qid]
            assert got["match_id"].tolist() == order.tolist()
            assert got["score"].tolist() == s[order].tolist()
            assert got["rank"].tolist() == list(range(1, 11))


class TestSourceDistinctKmv:
    def test_estimate_tracks_planted_overlap(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries

        # sources A/B share exactly half their 40-word vocabularies;
        # C is disjoint from both
        shared = [f"sh{i}" for i in range(20)]
        a_only = [f"aa{i}" for i in range(20)]
        b_only = [f"bb{i}" for i in range(20)]
        c_only = [f"cc{i}" for i in range(40)]
        rows = []
        rng = np.random.RandomState(3)
        for did in range(120):
            src = ["A", "B", "C"][did % 3]
            vocab = {"A": shared + a_only, "B": shared + b_only,
                     "C": c_only}[src]
            rows.append((did, " ".join(rng.choice(vocab, size=30)), src))
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "source": pa.array([r[2] for r in rows]),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = queries.QUERIES["source_distinct_kmv"](str(tmp_path))
        est = {(a, b): j for a, b, j in
               zip(out["src_a"], out["src_b"], out["jaccard_est"])}
        # true J(A,B) = 20/60 = 0.333; k=16 of 40-hash unions -> noisy
        # but must clearly separate overlap from disjointness
        assert est[("A", "C")] == 0.0
        assert est[("B", "C")] == 0.0
        assert 0.05 < est[("A", "B")] < 0.75

    def test_bottom_k_merge_law(self):
        # bottom-k of a union == bottom-k of the union of bottom-k's —
        # the property that makes the per-block partial lossless
        rng = np.random.RandomState(9)
        K = 16
        parts = [np.unique(rng.randint(0, 1 << 60, size=200).astype(
            np.uint64)) for _ in range(5)]
        full = np.unique(np.concatenate(parts))[:K]
        merged = np.unique(np.concatenate([p[:K] for p in parts]))[:K]
        assert (full == merged).all()


class TestMomentMatrix:
    def test_solves_planted_linear_model(self, ray_session, tmp_path):
        """End use: recover a planted linear relation from the moment
        rows alone (the 18x18 driver solve the docstring promises)."""
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries
        from osm_live_updates_ray.functions import hashing

        rng = np.random.RandomState(23)
        vocab = [f"tok{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 40)))
                 for _ in range(200)]

        def emb(tx):
            v = np.zeros(16, dtype=np.int64)
            for w in tx.split(" "):
                h = int(hashing.hash_strings_poly([w]).view(np.uint64)[0])
                v[h % 16] += 1 - 2 * ((h >> 4) & 1)
            return v
        X = np.stack([emb(tx) for tx in texts])
        beta = rng.randint(-3, 4, size=16)
        y = X @ beta + 7  # exact linear relation, intercept 7
        t = pa.table({
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts),
            "n_chars": pa.array(y.astype(np.int64)),
        })
        pq.write_table(t, tmp_path / "documents.parquet")
        out = queries.QUERIES["embed_moment_matrix"](
            str(tmp_path)).to_pandas()
        M = np.zeros((18, 18), dtype=np.int64)
        for i, j, m in zip(out["i"], out["j"], out["m"]):
            M[i, j] = M[j, i] = m
        # integer cross-checks straight off the moment rows
        assert M[16, 16] == 200          # n
        assert M[16, 17] == y.sum()      # sum(y)
        assert M[17, 17] == (y * y).sum()
        # a hash dim no token lands in gives a zero row/col, so solve
        # via lstsq and assert exact PREDICTION recovery (unused dims'
        # coefficients are unidentifiable but never used)
        A, b = M[:17, :17], M[:17, 17]
        coef = np.linalg.lstsq(A.astype(np.float64),
                               b.astype(np.float64), rcond=None)[0]
        pred = X @ coef[:16] + coef[16]
        np.testing.assert_allclose(pred, y, atol=1e-6)


class TestKeepBestDistributedGate:
    def test_forced_distributed_cc_equals_default(self, ray_session):
        from osm_live_updates_ray import queries

        want = (queries.QUERIES["near_dup_keep_best"]("/root/testdata/sf0.001")
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got = (queries.near_dup_keep_best("/root/testdata/sf0.001",
                                          cc_gate_rows=0)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)


class TestDataQuality:
    def test_planted_violations_are_counted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from osm_live_updates_ray import queries

        pq.write_table(pa.table({
            "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        }), tmp_path / "customer.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
            # custkey 9 missing from customer -> 2 violations
            "o_custkey": pa.array([1, 9, 9], type=pa.int64()),
        }), tmp_path / "orders.parquet")
        pq.write_table(pa.table({
            # orderkey 99 missing -> 1 violation
            "l_orderkey": pa.array([10, 99, 12], type=pa.int64()),
        }), tmp_path / "lineitem.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 0, 1], type=pa.int64()),  # dup id
            "text": pa.array(["abc", "abc", "xy"]),
            # n_chars wrong for the last row -> 1 violation
            "n_chars": pa.array([3, 3, 5], type=pa.int64()),
        }), tmp_path / "documents.parquet")
        pq.write_table(pa.table({
            "ts": pa.array([None, 1000], type=pa.timestamp("us")),
        }), tmp_path / "events.parquet")
        out = queries.QUERIES["data_quality_checks"](str(tmp_path))
        v = dict(zip(out["check_name"], out["violations"]))
        assert v == {
            "orders_custkey_fk": 2,
            "lineitem_orderkey_fk": 1,
            "documents_docid_unique": 1,
            "documents_nchars_consistent": 1,
            "events_ts_null": 1,
        }
        # forced anti-join branch (gate=0): the at-scale FK probe —
        # no dim-key set ever collected — must count identically
        out2 = queries.data_quality_checks(str(tmp_path), _gate_keys=0)
        assert dict(zip(out2["check_name"], out2["violations"])) == v
