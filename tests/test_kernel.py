"""Extraction-kernel semantics vs reference esmarc/marc.py behavior."""

from __future__ import annotations

from esmarc_ray.kernel import classify_entity, marc_get, marc_values, subfield_sets
from esmarc_ray.values import adjacent_uniq, collapse, merge_value


def test_collapse():
    assert collapse(["a"]) == "a"
    assert collapse([]) is None
    assert collapse(None) is None
    assert collapse(["a", "b"]) == ["a", "b"]
    assert collapse("ab") == "ab"
    assert collapse({"k": 1}) == {"k": 1}
    assert collapse(0) == 0


def test_merge_value():
    assert merge_value(None, "a") == "a"
    assert merge_value("a", "b") == ["a", "b"]
    assert merge_value(["a"], "a") == ["a"]
    assert merge_value(["a"], ["b", "a", "c"]) == ["a", "b", "c"]
    assert merge_value([], ["x"]) == ["x"]


def test_adjacent_uniq_is_not_set_dedup():
    assert adjacent_uniq(["a", "a", "b", "a"]) == ["a", "b", "a"]


def test_marc_get_control_fields(reference_records):
    rec = reference_records["1405783028"]
    assert marc_get(rec, "001") == "1405783028"
    assert marc_get(rec, "003") == "DE-627"
    assert marc_get(rec, "005") == "20220613140355.0"


def test_marc_get_subfield_path(reference_records):
    rec = reference_records["1405783028"]
    assert marc_get(rec, "264..b") == "Impensis Theobaldi Schönwetteri"
    assert marc_get(rec, "079..b") is None


def test_marc_get_multiple_specs(reference_records):
    rec = reference_records["1405783028"]
    got = marc_get(rec, "035..a")
    assert "(DE-627)1405783028" in got


def test_marc_get_plus_join():
    rec = {"110": [{"2_": [{"a": "Uni"}, {"b": "Dept"}]}]}
    assert marc_get(rec, "110..a+b") == "Uni. Dept"


def test_subfield_sets_groups_repeats():
    rec = {
        "689": [
            {"00": [{"a": "Alpha"}, {"0": "(DE-588)1"}, {"0": "(DE-627)2"}]},
            {"01": [{"a": "Beta"}]},
        ]
    }
    sets = list(subfield_sets(rec, "689", "*"))
    assert sets == [{"a": "Alpha", "0": ["(DE-588)1", "(DE-627)2"]}, {"a": "Beta"}]
    only00 = list(subfield_sets(rec, "689", "00"))
    assert len(only00) == 1 and only00[0]["a"] == "Alpha"
    prefix0 = list(subfield_sets(rec, "689", "0*"))
    assert len(prefix0) == 2


def test_indicator_negation_is_dead_code():
    rec = {"689": [{"00": [{"a": "Alpha"}]}]}
    assert list(subfield_sets(rec, "689", "!00")) == []


def test_classify_entity(reference_records):
    # all 17 fixtures are resources (no 079 field)
    for rec in reference_records.values():
        assert classify_entity(rec) == "resources"
    assert classify_entity({"079": [{"__": [{"b": "p"}]}]}) == "persons"
    assert classify_entity({"079": [{"__": [{"b": "zz"}]}]}) is None
