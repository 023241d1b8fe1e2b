"""LanceStyleTable source: parquet path, lance gating, column pruning."""

import pytest
import ray.data

from rastertiler_rs_ray.sources.tables import LanceStyleTable, read_table

SF = "/root/testdata/sf0.001"


def test_parquet_table_roundtrip(ray_session):
    t = LanceStyleTable(f"{SF}/documents.parquet")
    n = t.count_rows()
    assert n > 0
    assert "text" in t.schema().names
    ds = t.to_dataset(columns=["doc_id", "lang"])
    assert ds.schema().names == ["doc_id", "lang"]
    assert ds.count() == n


def test_lance_path_is_gated(ray_session):
    t = LanceStyleTable("/tmp/notthere.lance")
    with pytest.raises(ImportError, match="lance"):
        t.to_dataset()


def test_read_table_prunes_columns(ray_session):
    ds = read_table(SF, "events", columns=["event_id"])
    assert ds.schema().names == ["event_id"]
