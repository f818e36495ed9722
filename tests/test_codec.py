"""Span codec invariants (FIXTURES.md §1, north-rule span-sequence equality)."""

from __future__ import annotations

import pyarrow as pa

from esmarc_ray.codec import (
    DOCUMENT_SCHEMA,
    batch_to_records,
    decode_spans,
    encode_record,
    records_to_table,
)


def test_roundtrip_all_reference_fixtures(reference_records):
    """decode(encode(record)) == record and encode(decode(spans)) == spans."""
    for rid, record in reference_records.items():
        spans = encode_record(record)
        # offsets strictly increasing from 0
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        decoded = decode_spans(spans)
        assert decoded == record, f"record round-trip failed for {rid}"
        respans = encode_record(decoded)
        assert respans == spans, f"span-sequence equality failed for {rid}"


def test_media_spans_derived_from_856(reference_records):
    rec = reference_records["1405783028"]
    spans = encode_record(rec)
    media = [s for s in spans if s["kind"] == "media"]
    urls = {
        sf["u"]
        for occ in rec.get("856", [])
        for sfs in occ.values()
        for sf in sfs
        if "u" in sf
    }
    assert {m["media_ref"] for m in media} == urls
    assert all(m["text"] == "" for m in media)
    # each media span directly follows its source 856$u span
    for m in media:
        prev = spans[m["offset"] - 1]
        assert prev["kind"].startswith("sub:856:") and prev["kind"].split(":")[3] == "u"
        assert prev["text"] == m["media_ref"]


def test_arrow_table_roundtrip(reference_records):
    table = records_to_table(sorted(reference_records.items()))
    assert table.schema.equals(DOCUMENT_SCHEMA)
    decoded = dict(batch_to_records(table))
    assert decoded == reference_records


def test_repeated_tag_occurrences_stay_separate():
    record = {
        "001": "x1",
        "035": [{"__": [{"a": "(DE-627)1"}]}, {"__": [{"a": "(DE-576)2"}]}],
        "024": [{"7_": [{"a": "urn:foo"}, {"2": "urn"}]}],
    }
    assert decode_spans(encode_record(record)) == record


# -- property-based round-trip (hypothesis) -----------------------------------

from hypothesis import given, settings, strategies as st

_tag = st.from_regex(r"0(1[0-9]|[2-9][0-9])|[1-9][0-9]{2}", fullmatch=True)
_ctl_tag = st.sampled_from(["002", "003", "005", "006", "007", "008", "009"])
_ind = st.from_regex(r"[_0-9][_0-9]", fullmatch=True)
_code = st.from_regex(r"[a-z0-9]", fullmatch=True)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=1, max_size=30,
)

_subfield = st.tuples(_code, _text).map(lambda t: {t[0]: t[1]})
_occurrence = st.tuples(_ind, st.lists(_subfield, min_size=1, max_size=5)).map(
    lambda t: {t[0]: t[1]}
)


@st.composite
def marc_records(draw):
    record = {"001": draw(st.from_regex(r"[0-9]{6,10}", fullmatch=True))}
    for tag in draw(st.lists(_ctl_tag, max_size=3, unique=True)):
        record[tag] = draw(st.lists(_text, min_size=1, max_size=2))
    for tag in draw(st.lists(_tag, max_size=6, unique=True)):
        record[tag] = draw(st.lists(_occurrence, min_size=1, max_size=3))
    if draw(st.booleans()):
        record["_LEADER"] = draw(_text)
    if draw(st.booleans()):
        record["_TYPE"] = "Bibliographic"
    return record


@given(marc_records())
@settings(max_examples=200, deadline=None)
def test_codec_roundtrip_property(record):
    spans = encode_record(record)
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    decoded = decode_spans(spans)
    assert decoded == record
    assert encode_record(decoded) == spans


def test_sliced_batch_decodes_correctly(reference_records):
    """A sliced Table/ListArray has offsets indexing the UNSLICED child while
    flatten() rebases to 0 — batch_to_records must rebase explicitly."""
    items = sorted(reference_records.items())
    table = records_to_table(items)
    sliced = table.slice(2, 5)
    decoded = batch_to_records(sliced)
    assert decoded == items[2:7]
    # a sliced RecordBatch keeps a plain (non-chunked) sliced ListArray whose
    # offsets are NOT rebased by any combine_chunks — the raw fixed path
    rb = table.combine_chunks().to_batches()[0].slice(3, 4)
    assert rb.column("spans").offsets[0].as_py() != 0
    assert batch_to_records(rb) == items[3:7]
