"""Corpus-hygiene battery entries: PII redaction, paragraph-level
dedup, benchmark-contamination screening (planted fixtures — the
oracle gate covers the SQL equivalence; these pin the semantics)."""

import pyarrow as pa
import pyarrow.parquet as pq

from osm_live_updates_ray.queries import QUERIES


def _write_docs(tmp_path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts}),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


class TestPiiRedact:
    def test_counts_and_redaction(self, ray_session, tmp_path):
        sf = _write_docs(
            tmp_path,
            ["reach me at alice@corp.org or 192.168.0.1 today", "plain text"],
        )
        out = (
            QUERIES["pii_redact"](sf).to_pandas().set_index("doc_id").sort_index()
        )
        # doc 0: 1 email + 1 IP in the body, plus the doc-seeded contact
        # line's email/phone/IP appended by the entry itself
        assert out.loc[0, "n_emails"] == 2
        assert out.loc[0, "n_phones"] == 1
        assert out.loc[0, "n_ips"] == 2
        assert out.loc[1, "n_emails"] == 1
        r0 = out.loc[0, "redacted"]
        assert r0.count("<EMAIL>") == 2 and r0.count("<IP>") == 2
        assert "alice@corp.org" not in r0 and "192.168.0.1" not in r0
        assert "<PHONE>" in out.loc[1, "redacted"]


class TestParagraphDedup:
    def test_keep_first_semantics(self, ray_session, tmp_path):
        w = [f"w{i}" for i in range(16)]  # one 16-word passage
        u = [f"u{i}" for i in range(16)]  # a distinct passage
        a = " ".join(w + u)               # doc 0: two passages
        b = " ".join(w + [f"b{i}" for i in range(16)])  # dup of passage 1
        c = a                             # full dup of doc 0
        sf = _write_docs(tmp_path, [a, b, c])
        out = (
            QUERIES["paragraph_dedup"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[0, "text"] == a and out.loc[0, "n_dropped"] == 0
        assert out.loc[1, "text"] == " ".join(f"b{i}" for i in range(16))
        assert out.loc[1, "n_dropped"] == 1
        assert out.loc[2, "text"] == "" and out.loc[2, "n_dropped"] == 2

    def test_short_doc_single_chunk(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, ["tiny doc", "tiny doc", "other"])
        out = (
            QUERIES["paragraph_dedup"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[0, "text"] == "tiny doc"
        assert out.loc[1, "text"] == "" and out.loc[1, "n_dropped"] == 1
        assert out.loc[2, "text"] == "other"


class TestContamination:
    def test_flags_benchmark_overlap(self, ray_session, tmp_path):
        bench = " ".join(f"g{i}" for i in range(10))  # doc 0 (0 % 31 == 0)
        leaked = "x y " + " ".join(f"g{i}" for i in range(8)) + " z"
        clean = " ".join(f"c{i}" for i in range(12))
        short = "too short"  # < 8 tokens: zero grams, must still emit
        sf = _write_docs(tmp_path, [bench, leaked, clean, short])
        out = (
            QUERIES["contamination_ngrams"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert list(out.index) == [1, 2, 3]  # benchmark doc excluded
        assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_contam"] == 1
        assert not bool(out.loc[2, "contaminated"])
        assert out.loc[3, "n_contam"] == 0


class TestDuplicateSpans:
    def test_maximal_spans_and_min_length(self, ray_session, tmp_path):
        shared = [f"s{i}" for i in range(20)]   # 20-token duplicated run
        short = [f"t{i}" for i in range(15)]    # 15 tokens: below window
        a = " ".join(["a0", "a1"] + shared + ["a2"])
        b = " ".join(["b0"] + shared + ["b1", "b2", "b3"])
        c = " ".join(["c0"] + short + ["c1"])
        d = " ".join(["d0", "d1", "d2"] + short)
        sf = _write_docs(tmp_path, [a, b, c, d])
        out = (
            QUERIES["duplicate_spans"](sf)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # only the 20-token run is >= the 16-token window; it must come
        # back as ONE maximal span per doc at the right offsets
        assert list(out["doc_id"]) == [0, 1]
        assert list(out["span_start"]) == [2, 1]
        assert list(out["span_end"]) == [21, 20]
        assert list(out["n_tokens"]) == [20, 20]

    def test_within_doc_repeat_found(self, ray_session, tmp_path):
        run = [f"r{i}" for i in range(16)]
        a = " ".join(run + ["x"] + run)          # repeats inside one doc
        sf = _write_docs(tmp_path, [a, "unrelated words only here"])
        out = QUERIES["duplicate_spans"](sf).to_pandas()
        assert sorted(out["span_start"]) == [0, 17]
        assert (out["doc_id"] == 0).all()

    def test_islands_not_polluted_across_docs(self, ray_session, tmp_path):
        """A long span late in doc 0 must not merge doc 1's two
        separate islands (regression: the running span-end cummax must
        reset per doc)."""
        run1 = [f"p{i}" for i in range(16)]
        run2 = [f"q{i}" for i in range(16)]
        filler = [f"f{i}" for i in range(40)]
        a = " ".join(filler + run1 + run2)            # spans live at 40..71
        b = " ".join(run1 + ["gap"] + run2)           # islands 0..15, 17..32
        c = " ".join(run1 + ["zz"] + run2)            # makes both runs dups
        sf = _write_docs(tmp_path, [a, b, c])
        out = (
            QUERIES["duplicate_spans"](sf)
            .to_pandas().sort_values(["doc_id", "span_start"])
        )
        b_rows = out[out["doc_id"] == 1]
        assert list(b_rows["span_start"]) == [0, 17]
        assert list(b_rows["span_end"]) == [15, 32]


class TestRemoveDuplicateSpans:
    def test_cut_matches_span_report(self, ray_session, tmp_path):
        shared = [f"s{i}" for i in range(20)]
        a = " ".join(["a0", "a1"] + shared + ["a2"])
        b = " ".join(["b0"] + shared + ["b1"])
        c = "some clean unrelated words"
        sf = _write_docs(tmp_path, [a, b, c])
        out = (
            QUERIES["remove_duplicate_spans"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[0, "text"] == "a0 a1 a2"
        assert out.loc[0, "n_removed"] == 20
        assert out.loc[1, "text"] == "b0 b1"
        assert out.loc[2, "text"] == c and out.loc[2, "n_removed"] == 0

    def test_whole_doc_removed(self, ray_session, tmp_path):
        run = [f"r{i}" for i in range(16)]
        sf = _write_docs(tmp_path, [" ".join(run), " ".join(run)])
        out = (
            QUERIES["remove_duplicate_spans"](sf)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert list(out["text"]) == ["", ""]
        assert list(out["n_removed"]) == [16, 16]


class TestSourceLangRollupNullContract:
    def test_null_group_key_fails_loudly(self, ray_session, tmp_path):
        """A NULL source/lang would collide with the '<all>' rollup
        sentinel (SQL COALESCE maps it there; pandas groups it
        differently) — the kernel must refuse the corpus instead of
        silently mis-bucketing."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest
        import ray

        pq.write_table(pa.table({
            "source": pa.array(["web", None]),
            "lang": pa.array(["en", "en"]),
            "n_chars": pa.array([3, 4], type=pa.int64()),
        }), tmp_path / "documents.parquet")
        with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                           match="NULL"):
            QUERIES["source_lang_rollup"](str(tmp_path))
