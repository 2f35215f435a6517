"""HyperLogLog sketch (functions/sketch.py) + the new rollup/argmax
operators added with it (queries.py: events_latest, lang_distinct_words,
lang_distinct_words_hll, source_rollup — the SQL-oracled ones are also
gated by selfcheck; here we pin the non-SQL properties)."""

import numpy as np
import pandas as pd
import pytest

from osm_live_updates_ray.functions import sketch

SF = "/root/testdata/sf0.001"


class TestHLLCore:
    def test_estimate_error_bound(self):
        # m=1024 => standard error ~3.2%; allow 4 sigma
        rng = np.random.RandomState(7)
        for n in (100, 5_000, 200_000):
            vals = np.array([f"item-{i}" for i in range(n)], dtype=object)
            reg, rank = sketch.register_ranks(vals)
            g, r, mx = sketch.partial_max(reg, rank, np.zeros(n, dtype=np.int64))
            est = sketch.estimate(r, mx)
            assert abs(est - n) / n < 0.13, (n, est)

    def test_merge_is_union(self):
        # register-wise max of two partials == sketch of the union
        a = np.array([f"a{i}" for i in range(3000)], dtype=object)
        b = np.array([f"b{i}" for i in range(3000)], dtype=object)
        both = np.concatenate([a, b])
        ra, ka = sketch.register_ranks(a)
        rb, kb = sketch.register_ranks(b)
        ru, ku = sketch.register_ranks(both)
        grid = np.zeros(sketch.M, dtype=np.int8)
        np.maximum.at(grid, ra, ka)
        np.maximum.at(grid, rb, kb)
        grid_u = np.zeros(sketch.M, dtype=np.int8)
        np.maximum.at(grid_u, ru, ku)
        assert np.array_equal(grid, grid_u)

    def test_partial_max_grouped(self):
        vals = np.array(["x", "y", "z", "x"], dtype=object)
        reg, rank = sketch.register_ranks(vals)
        grp = np.array([0, 0, 1, 1], dtype=np.int64)
        g, r, mx = sketch.partial_max(reg, rank, grp)
        assert set(g) <= {0, 1}
        assert (mx >= 1).all()

    def test_ranks_at_least_one(self):
        vals = np.array([f"w{i}" for i in range(50_000)], dtype=object)
        _, rank = sketch.register_ranks(vals)
        assert rank.min() >= 1
        assert rank.max() <= 64 - sketch.P + 1


class TestNewQueries:
    def test_hll_close_to_exact(self, ray_session):
        from osm_live_updates_ray.queries import (
            lang_distinct_words,
            lang_distinct_words_hll,
        )

        exact = lang_distinct_words(SF).to_pandas().set_index("lang")
        approx = lang_distinct_words_hll(SF).set_index("lang")
        assert set(exact.index) == set(approx.index)
        for lang in exact.index:
            e = exact.loc[lang, "n_distinct"]
            a = approx.loc[lang, "n_distinct_approx"]
            assert abs(a - e) / max(e, 1) < 0.13, (lang, e, a)

    def test_events_latest_matches_pandas(self, ray_session):
        import pyarrow.parquet as pq

        from osm_live_updates_ray.queries import events_latest

        got = (
            events_latest(SF)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        want = (
            ev.sort_values(["ts", "event_id"], ascending=False)
            .drop_duplicates("user_id")
            .sort_values("user_id")
            .reset_index(drop=True)[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_events_latest_one_row_per_user(self, ray_session):
        from osm_live_updates_ray.queries import events_latest

        df = events_latest(SF).to_pandas()
        assert df["user_id"].is_unique


class TestMorton:
    def test_interleave_matches_bit_reference(self):
        from osm_live_updates_ray.functions.cells import morton_interleave

        rng = np.random.RandomState(3)
        xs = rng.randint(0, 1 << 16, 500)
        ys = rng.randint(0, 1 << 16, 500)

        def ref(x, y):
            m = 0
            for i in range(16):
                m |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
            return m

        got = morton_interleave(xs, ys)
        want = np.array([ref(int(x), int(y)) for x, y in zip(xs, ys)])
        assert np.array_equal(got, want)

    def test_locality(self):
        # neighbors on the grid have nearby keys: a 2x2 block spans
        # at most a 16-key range in z-order
        from osm_live_updates_ray.functions.cells import morton_interleave

        for x0, y0 in [(0, 0), (100, 200), (511, 511)]:
            block = [
                morton_interleave(np.array([x]), np.array([y]))[0]
                for x in (x0, x0 + 1) for y in (y0, y0 + 1)
            ]
            if x0 % 2 == 0 and y0 % 2 == 0:
                assert max(block) - min(block) == 3


class TestImageMeta:
    def test_all_formats(self):
        import struct

        from osm_live_updates_ray.functions.media import encode_ppm, image_meta

        assert image_meta(encode_ppm(np.zeros((5, 7, 3), np.uint8))) == (
            "ppm", 7, 5)
        png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
               + struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0))
        assert image_meta(png) == ("png", 640, 480)
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
        assert image_meta(gif) == ("gif", 320, 200)
        bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 256, -128)
               + b"\x00" * 8)
        assert image_meta(bmp) == ("bmp", 256, 128)
        jpg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
               + b"\x00" * 9 + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
               + struct.pack(">HH", 600, 800) + b"\x03" + b"\x00" * 9)
        assert image_meta(jpg) == ("jpeg", 800, 600)

    def test_garbage_and_truncated(self):
        from osm_live_updates_ray.functions.media import image_meta

        assert image_meta(b"garbage") == ("unknown", -1, -1)
        assert image_meta(b"\xff\xd8\xff") == ("unknown", -1, -1)
        assert image_meta(b"") == ("unknown", -1, -1)
        assert image_meta(b"\x89PNG\r\n\x1a\n") == ("unknown", -1, -1)


class TestIncrementalNearDup:
    def _mk_corpus(self):
        rng = np.random.RandomState(11)
        words = [f"w{i:03d}" for i in range(400)]

        def doc(seed):
            r = np.random.RandomState(seed)
            return " ".join(r.choice(words, 60))

        texts = [doc(100 + i) for i in range(20)]
        return texts

    def test_cross_window_and_in_window_matches(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        texts = self._mk_corpus()
        accepted = pa.table(
            {"doc_id": pa.array(list(range(20)), type=pa.int64()),
             "text": pa.array(texts)}
        )
        idx = str(tmp_path / "nd_index")
        dd.build_band_index(rd.from_arrow(accepted), idx)

        near3 = texts[3].replace("w", "x", 1)  # one-token edit of doc 3
        w28 = " ".join(texts[5].split()[:59]) + " zz"
        win_texts = [near3, texts[7], "totally " * 40, w28, w28 + "q"]
        window = pa.table(
            {"doc_id": pa.array([20, 21, 22, 28, 29], type=pa.int64()),
             "text": pa.array(win_texts)}
        )
        out = dd.incremental_near_dup(rd.from_arrow(window), idx)
        got = set(zip(out["new_id"], out["match_id"]))
        assert (20, 3) in got       # near-copy of accepted doc
        assert (21, 7) in got       # exact copy of accepted doc
        assert (29, 28) in got      # in-window near-pair
        assert not any(n == 22 for n, _ in got)  # unique doc untouched
        exact = out[(out["new_id"] == 21) & (out["match_id"] == 7)]
        assert float(exact["est_jaccard"].iloc[0]) == 1.0

    def test_replay_is_self_match_free(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        texts = self._mk_corpus()
        accepted = pa.table(
            {"doc_id": pa.array(list(range(10)), type=pa.int64()),
             "text": pa.array(texts[:10])}
        )
        idx = str(tmp_path / "nd_index2")
        dd.build_band_index(rd.from_arrow(accepted), idx)
        window = pa.table(
            {"doc_id": pa.array([40, 41], type=pa.int64()),
             "text": pa.array([texts[10], texts[11]])}
        )
        first = dd.incremental_near_dup(rd.from_arrow(window), idx)
        assert len(first) == 0
        dd.update_band_index(rd.from_arrow(window), idx)
        replay = dd.incremental_near_dup(rd.from_arrow(window), idx)
        # replaying the SAME window: its docs match only their own
        # persisted copies, which the new_id != match_id filter drops
        assert len(replay) == 0


class TestSigPrefilter:
    def test_prefilter_equals_exact_on_corpus(self, ray_session):
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        docs = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        cand = dd.minhash_candidate_pairs(docs).materialize()
        plain = (
            dd.verify_pairs_distributed(cand, docs).to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        screened = (
            dd.verify_pairs_distributed(cand, docs, sig_prefilter=True)
            .to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, screened)

    def test_mismatched_n_parts_raises_not_silent(self, ray_session, tmp_path):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        texts = TestIncrementalNearDup()._mk_corpus()
        accepted = pa.table(
            {"doc_id": pa.array(list(range(10)), type=pa.int64()),
             "text": pa.array(texts[:10])}
        )
        idx = str(tmp_path / "nd_index3")
        dd.build_band_index(rd.from_arrow(accepted), idx, n_parts=64)
        window = pa.table(
            {"doc_id": pa.array([50], type=pa.int64()),
             "text": pa.array([texts[3]])}  # exact dup -> band hit
        )
        # querying with a different n_parts would probe the wrong
        # shards and silently miss everything; the index manifest
        # (meta.json, the ST2 store-discovered-options pattern) must
        # reject the mismatch loudly
        with pytest.raises(ValueError, match="mismatched parameters"):
            dd.incremental_near_dup(rd.from_arrow(window), idx, n_parts=16)


class TestBloomSidecar:
    def test_bloom_kernel(self):
        from osm_live_updates_ray.functions import bloom

        keys = np.arange(5000, dtype=np.int64) * 7919 + 3
        b = bloom.build(keys)
        assert bloom.might_contain(b, keys).all()  # no false negatives
        other = np.setdiff1d(
            np.arange(20000, dtype=np.int64) * 104729 + 11, keys
        )
        assert bloom.might_contain(b, other).mean() < 0.03
        # append path: OR-in preserves no-false-negatives for BOTH sets
        more = np.arange(5000, 7000, dtype=np.int64) * 31 + 7
        bloom.build_into(b, more)
        assert bloom.might_contain(b, keys).all()
        assert bloom.might_contain(b, more).all()

    def test_bloom_non_byte_aligned_width(self):
        # regression: build() used to hash mod bits_per_key*n while
        # might_contain hashed mod len(bits)*8 (the byte-padded width);
        # whenever bits_per_key*n % 8 != 0 the moduli differed and
        # present keys could read "definitely absent" (false negatives)
        from osm_live_updates_ray.functions import bloom

        for n in (13, 101, 6003):  # 10*n % 8 != 0 for all of these
            keys = np.arange(n, dtype=np.int64) * 2654435761 + 17
            b = bloom.build(keys)
            assert bloom.might_contain(b, keys).all(), n
            more = keys * 31 + 5
            bloom.build_into(b, more)
            assert bloom.might_contain(b, more).all(), n

    def test_update_index_rebuilds_missing_sidecar(self, ray_session, tmp_path):
        # regression: update_hash_index on a part with fingerprints on
        # disk but NO _bloom.npy (crash before the sidecar phase) used
        # to write a fresh Bloom covering only the window's keys — the
        # sidecar then false-negatived every pre-existing key and the
        # shard-skip admitted duplicates of them
        import glob
        import os

        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        texts = TestIncrementalNearDup()._mk_corpus()
        accepted = pa.table(
            {"doc_id": pa.array(list(range(10)), type=pa.int64()),
             "text": pa.array(texts[:10])}
        )
        idx = str(tmp_path / "fp_index_nosidecar")
        dd.build_hash_index(rd.from_arrow(accepted), idx)
        for f in glob.glob(f"{idx}/part=*/_bloom.npy"):
            os.remove(f)  # simulate crash before the sidecar phase
        window = pa.table(
            {"doc_id": pa.array([40, 41], type=pa.int64()),
             "text": pa.array([texts[10], texts[11]])}  # fresh docs
        )
        dd.update_hash_index(
            rd.from_arrow(window).map_batches(
                lambda t: dd._fingerprint_and_part(t, "text",
                                                   dd.N_INDEX_PARTS),
                batch_format="pyarrow",
            ),
            idx,
        )
        # duplicates of the PRE-EXISTING accepted docs must still be
        # rejected (the rebuilt sidecars must cover the on-disk keys)
        probe = pa.table(
            {"doc_id": pa.array([50, 51, 52], type=pa.int64()),
             "text": pa.array([texts[2], texts[10], texts[12]])}
        )
        surv = dd.incremental_dedup(rd.from_arrow(probe), idx).to_pandas()
        assert sorted(surv["doc_id"]) == [52]

    def test_incremental_dedup_with_sidecars(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from osm_live_updates_ray.stages import dedup_docs as dd

        texts = TestIncrementalNearDup()._mk_corpus()
        accepted = pa.table(
            {"doc_id": pa.array(list(range(10)), type=pa.int64()),
             "text": pa.array(texts[:10])}
        )
        idx = str(tmp_path / "fp_index")
        dd.build_hash_index(rd.from_arrow(accepted), idx)
        import glob

        assert glob.glob(f"{idx}/part=*/_bloom.npy")  # sidecars exist
        # window: 2 dups of accepted docs + 3 fresh
        window = pa.table(
            {"doc_id": pa.array([30, 31, 32, 33, 34], type=pa.int64()),
             "text": pa.array([texts[2], texts[5],
                               texts[10], texts[11], texts[12]])}
        )
        surv = dd.incremental_dedup(rd.from_arrow(window), idx).to_pandas()
        assert sorted(surv["doc_id"]) == [32, 33, 34]
        # append survivors, replay the window: everything now a dup
        dd.update_hash_index(
            rd.from_arrow(window).map_batches(
                lambda t: dd._fingerprint_and_part(t, "text",
                                                   dd.N_INDEX_PARTS),
                batch_format="pyarrow",
            ).filter(expr="doc_id >= 32"),
            idx,
        )
        replay = dd.incremental_dedup(rd.from_arrow(window), idx).to_pandas()
        assert len(replay) == 0


class TestAudioMeta:
    def test_roundtrip_and_garbage(self):
        from osm_live_updates_ray.functions.media import audio_meta, encode_wav

        x = np.zeros(16000, np.int16)
        assert audio_meta(encode_wav(x, 16000)) == ("wav", 16000, 1, 1000)
        assert audio_meta(encode_wav(np.zeros(4000, np.int16), 8000)) == (
            "wav", 8000, 1, 500)
        assert audio_meta(b"garbage") == ("unknown", -1, -1, -1)
        assert audio_meta(b"RIFF\x00\x00\x00\x00WAVE") == (
            "unknown", -1, -1, -1)
        assert audio_meta(b"") == ("unknown", -1, -1, -1)


class TestKmvQuantiles:
    def test_merge_equals_single_pass_and_error_bound(self):
        """Bottom-k of the union == union of bottom-k's (exact), and the
        sketch quantiles land within the rank-space error bound of the
        exact quantiles."""
        import pandas as pd

        from osm_live_updates_ray.functions import hashing
        from osm_live_updates_ray.stages.sketchq import KMV_K, kmv_merge_quantiles

        rng = np.random.RandomState(11)
        n = 60_000
        vals = rng.lognormal(5.0, 1.0, n)
        ids = np.arange(n, dtype=np.int64)
        h = hashing.hash_int64(ids)
        df = pd.DataFrame({"lang": "en", "h": h, "v": vals})
        # split into 13 uneven "blocks", bottom-k each, merge
        parts = np.array_split(df.sample(frac=1.0, random_state=3), 13)
        partials = pd.concat([p.nsmallest(KMV_K, "h") for p in parts])
        merged = kmv_merge_quantiles(partials)
        direct = kmv_merge_quantiles(df)  # single-pass bottom-k
        pd.testing.assert_frame_equal(
            merged.reset_index(drop=True), direct.reset_index(drop=True)
        )
        for q in (0.5, 0.9, 0.99):
            est = float(merged[f"p{int(q * 100)}"].iloc[0])
            # rank-space bound: 5 standard errors of sqrt(q(1-q)/k)
            tol = 5.0 * np.sqrt(q * (1 - q) / KMV_K)
            lo = float(np.quantile(vals, max(q - tol, 0.0)))
            hi = float(np.quantile(vals, min(q + tol, 1.0)))
            assert lo <= est <= hi, (q, est, lo, hi)

    def test_entry_close_to_exact(self, ray_session):
        from osm_live_updates_ray import queries as Q

        got = Q.QUERIES["doc_length_quantiles_kmv"]("/root/testdata/sf0.01")
        df = got.to_pandas() if hasattr(got, "to_pandas") else got
        exact = Q.QUERIES["doc_length_quantiles"]("/root/testdata/sf0.01")
        exact = exact.to_pandas() if hasattr(exact, "to_pandas") else exact
        m = df.merge(exact, on="lang", suffixes=("_kmv", "_exact"))
        assert len(m) > 0
        for q in ("p50", "p90"):
            a = m[f"{q}_kmv"].to_numpy(dtype=np.float64)
            b = m[f"{q}_exact"].to_numpy(dtype=np.float64)
            # lengths are tightly distributed; 15% relative is ample for
            # a 1024-point sample at these quantiles
            assert (np.abs(a - b) <= 0.15 * np.maximum(b, 1.0)).all()
