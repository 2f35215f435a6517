"""JSONL/CSV ingestion round-trips onto the documents contract."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from osm_live_updates_ray.sources import text_formats as tf

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet")


def _sorted_pdf(ds):
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True))


class TestJsonl:
    def test_round_trip_equals_parquet(self, ray_session, tmp_path,
                                       docs_tbl):
        # two shards to exercise the parallel multi-file read
        rows = docs_tbl.to_pylist()
        half = len(rows) // 2
        for i, chunk in enumerate((rows[:half], rows[half:])):
            with open(tmp_path / f"part{i}.jsonl", "w") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")
        got = _sorted_pdf(tf.read_documents_jsonl(str(tmp_path)))
        want = _sorted_pdf_from_table(docs_tbl)
        assert got.equals(want)

    def test_column_pruning(self, ray_session, tmp_path, docs_tbl):
        with open(tmp_path / "d.jsonl", "w") as f:
            for r in docs_tbl.to_pylist():
                f.write(json.dumps(r) + "\n")
        got = tf.read_documents_jsonl(
            str(tmp_path / "d.jsonl"), columns=["doc_id", "lang"]
        )
        t = got.schema()
        assert t.names == ["doc_id", "lang"]

    def test_missing_column_is_loud(self, ray_session, tmp_path):
        with open(tmp_path / "bad.jsonl", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
        import ray.exceptions

        with pytest.raises(
            (ValueError, ray.exceptions.RayTaskError,
             ray.exceptions.UserCodeException),
            match="missing required column",
        ):
            tf.read_documents_jsonl(
                str(tmp_path / "bad.jsonl")).materialize()


class TestCsv:
    def test_round_trip_equals_parquet(self, ray_session, tmp_path,
                                       docs_tbl):
        pacsv.write_csv(docs_tbl, tmp_path / "docs.csv")
        got = _sorted_pdf(tf.read_documents_csv(str(tmp_path / "docs.csv")))
        want = _sorted_pdf_from_table(docs_tbl)
        assert got.equals(want)

    def test_downstream_operator_runs_on_csv(self, ray_session, tmp_path,
                                             docs_tbl):
        # the contract's point: a battery kernel runs unchanged
        pacsv.write_csv(docs_tbl, tmp_path / "docs.csv")
        ds = tf.read_documents_csv(str(tmp_path / "docs.csv"),
                                   columns=["doc_id", "text", "lang",
                                            "source", "n_chars"])
        import pyarrow.compute as pc

        n = ds.map_batches(
            lambda t: t.filter(pc.greater(t.column("n_chars"),
                                          pa.scalar(0))),
            batch_format="pyarrow",
        ).count()
        assert n == docs_tbl.num_rows


def _sorted_pdf_from_table(t: pa.Table):
    return (t.to_pandas().sort_values("doc_id").reset_index(drop=True))
