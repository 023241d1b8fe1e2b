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


class TestScrubTextSpans:
    def _doc(self):
        struct = pa.StructArray.from_arrays(
            [
                pa.array(["text", "image", "text", "audio"], pa.string()),
                pa.array(["mail me a@b.co now", "", "no pii here", ""], pa.string()),
                pa.array(["", "geo://x@y.zz", "", "snd://a@b.co"], pa.string()),
                pa.array([0, 1, 2, 3], pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans = pa.ListArray.from_arrays(pa.array([0, 2, 4], pa.int32()), struct)
        return pa.table({"doc_id": ["d1", "d2"], "spans": spans})

    def test_scrubs_only_text_spans(self, ray_session):
        from rastertiler_rs_ray.pipelines.spans import scrub_text_spans

        out = (
            scrub_text_spans(
                ray.data.from_arrow(self._doc()),
                pattern=r"[A-Za-z0-9._]+@[A-Za-z0-9.]+[A-Za-z0-9]",
                replacement="[EMAIL]",
            )
            .take_all()
        )
        by_id = {r["doc_id"]: r["spans"] for r in out}
        d1, d2 = by_id["d1"], by_id["d2"]
        assert d1[0]["text"] == "mail me [EMAIL] now"
        assert d2[0]["text"] == "no pii here"
        # media spans untouched EVEN where their ref matches the pattern
        assert d1[1]["media_ref"] == "geo://x@y.zz" and d1[1]["text"] == ""
        assert d2[1]["media_ref"] == "snd://a@b.co"
        # kinds, refs, offsets, order preserved
        for doc in (d1, d2):
            assert [sp["offset"] for sp in doc] == sorted(sp["offset"] for sp in doc)
        assert [sp["kind"] for sp in d1] == ["text", "image"]
        assert [sp["kind"] for sp in d2] == ["text", "audio"]
