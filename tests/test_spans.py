"""Interleaved span operators: explode / reassemble round-trip and the
span-sequence-equality invariant (input_hint)."""

import pyarrow as pa
import ray.data

from rastertiler_rs_ray.pipelines.spans import (
    explode_spans,
    reassemble_spans,
    spans_to_text,
)
from rastertiler_rs_ray.sources.docs import generate_documents, span_signatures


def _signatures(ds) -> dict:
    out = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        out.update(span_signatures(batch))
    return out


def test_explode_reassemble_roundtrip_preserves_span_sequences(ray_session):
    docs = generate_documents(500, override_num_blocks=4)
    before = _signatures(docs)
    back = reassemble_spans(explode_spans(docs), num_shards=7)
    after = _signatures(back)
    assert after == before and len(after) == 500


def test_explode_span_idx_is_in_document_order(ray_session):
    docs = generate_documents(50, override_num_blocks=2)
    ex = explode_spans(docs).to_pandas()
    for _, g in ex.groupby("doc_id"):
        idx = g.sort_values("offset")["span_idx"].to_list()
        assert idx == sorted(idx)  # offsets grow with span_idx
        assert sorted(g["span_idx"]) == list(range(len(g)))


def test_reassemble_invariant_to_input_partitioning(ray_session):
    docs = generate_documents(120, override_num_blocks=3)
    ex = explode_spans(docs)
    a = _signatures(reassemble_spans(ex, num_shards=1))
    b = _signatures(reassemble_spans(ex.repartition(11), num_shards=13))
    assert a == b


def test_spans_to_text_joins_text_spans_in_order(ray_session):
    struct = pa.StructArray.from_arrays(
        [
            pa.array(["text", "media", "text", "media"], pa.string()),
            pa.array(["hello", "", "world", ""], pa.string()),
            pa.array(["", "geo://1.0,2.0/a.png", "", "geo://3.0,4.0/b.png"], pa.string()),
            pa.array([0, 5, 6, 11], pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array([0, 3, 4, 4], pa.int32()), struct)
    tbl = pa.table({"doc_id": pa.array(["a", "b", "c"], pa.string()), "spans": spans})
    out = (
        spans_to_text(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert out == {"a": "hello world", "b": "", "c": ""}  # b: media-only, c: empty


def test_explode_handles_empty_and_null_spans(ray_session):
    """Empty/null spans contribute no rows WITHOUT misaligning span_idx
    for following docs; round trip is exact over span-bearing docs."""
    struct = pa.StructArray.from_arrays(
        [
            pa.array(["text", "text"], pa.string()),
            pa.array(["aa", "bb"], pa.string()),
            pa.array(["", ""], pa.string()),
            pa.array([0, 3], pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array([0, 0, 1, 2], pa.int32()), struct)
    tbl = pa.table(
        {"doc_id": pa.array(["empty", "a", "b"], pa.string()), "spans": spans}
    )
    ex = explode_spans(ray.data.from_arrow(tbl)).to_pandas()
    assert list(ex["doc_id"]) == ["a", "b"]
    assert list(ex["span_idx"]) == [0, 0]
    back = reassemble_spans(ray.data.from_pandas(ex), num_shards=2).to_pandas()
    assert set(back["doc_id"]) == {"a", "b"}  # documented: span-less doc drops


def test_reassemble_integer_ids(ray_session):
    """reassemble_spans must not hardcode string ids."""
    import pandas as pd

    ex = pd.DataFrame(
        {
            "doc_id": [5, 5, 9],
            "span_idx": [0, 1, 0],
            "kind": ["text", "media", "text"],
            "text": ["x", "", "y"],
            "media_ref": ["", "geo://1.0,2.0/a", ""],
            "offset": [0, 2, 0],
        }
    )
    back = reassemble_spans(ray.data.from_pandas(ex), num_shards=3).to_pandas()
    assert sorted(back["doc_id"]) == [5, 9]
    row5 = back[back.doc_id == 5].iloc[0]["spans"]
    assert [s["kind"] for s in row5] == ["text", "media"]
