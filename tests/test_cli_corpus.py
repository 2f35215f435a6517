"""`corpus` CLI subcommand: read -> filter -> dedup -> parquet."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_live_updates_ray.cli import main


@pytest.fixture()
def corpus(tmp_path):
    texts = [
        "a long enough english document about rivers and tiles one",
        "a long enough english document about rivers and tiles one",  # exact dup
        "ein ausreichend langes deutsches dokument ueber karten",
        "short",
        "another distinct english document with plenty of characters",
    ]
    langs = ["en", "en", "de", "en", "en"]
    t = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["w"] * 5),
        "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
    })
    p = tmp_path / "docs.parquet"
    pq.write_table(t, p)
    return str(p)


def _run(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


class TestCorpusCmd:
    def test_exact_dedup_and_filters(self, ray_session, corpus, tmp_path,
                                     capsys):
        out = str(tmp_path / "out")
        rc, res = _run(
            ["corpus", "--input", corpus, "--out", out,
             "--dedup", "exact", "--langs", "en", "--min-chars", "10",
             "--stats"],
            capsys,
        )
        assert rc == 0
        # 5 in; de row + short row filtered; one exact dup dropped
        assert res["rows_in"] == 5
        assert res["rows_after_filter"] == 3
        assert res["rows_out"] == 2
        got = pq.read_table(out)
        assert sorted(got.column("doc_id").to_pylist()) == [0, 4]

    def test_jsonl_input_sniffed(self, ray_session, corpus, tmp_path,
                                 capsys):
        rows = pq.read_table(corpus).to_pylist()
        jl = tmp_path / "docs.jsonl"
        with open(jl, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        out = str(tmp_path / "out2")
        rc, res = _run(
            ["corpus", "--input", str(jl), "--out", out,
             "--dedup", "none"], capsys,
        )
        assert rc == 0 and res["format"] == "jsonl"
        assert pq.read_table(out).num_rows == 5

    def test_minhash_near_dup_drop(self, ray_session, tmp_path, capsys):
        base = " ".join(f"tok{i}" for i in range(40))
        texts = [base, base + " tail", "completely different words here",
                 " ".join(f"other{i}" for i in range(40))]
        t = pa.table({
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["w"] * 4),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        })
        p = tmp_path / "d.parquet"
        pq.write_table(t, p)
        out = str(tmp_path / "out3")
        rc, res = _run(
            ["corpus", "--input", str(p), "--out", out,
             "--dedup", "minhash", "--minhash-threshold", "0.7"],
            capsys,
        )
        assert rc == 0
        got = sorted(pq.read_table(out).column("doc_id").to_pylist())
        assert got == [0, 2, 3]  # near-dup doc 1 dropped, min id kept
