"""Declared output-schema typing gate (reference mapping/*.json contracts)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from esmarc_ray.ops.schema_gate import (
    OUTPUT_SCHEMA,
    date_typed_fields,
    schema_checks,
    schema_typing_report,
)


def test_declared_table_matches_reference():
    # 7 entity classes, one per reference mapping file; every date-typed
    # subfield declared there must be present here
    assert sorted(OUTPUT_SCHEMA) == [
        "events", "geo", "organizations", "persons", "resources", "topics", "works",
    ]
    fields = date_typed_fields()
    assert ("persons", "birthDate", "@value") in fields
    assert ("resources", "datePublished", "dateParsed") in fields
    assert ("events", "startDate", "@value") in fields
    assert len(fields) == 15
    # the companion text-typed subfields are carried too
    assert OUTPUT_SCHEMA["persons"]["birthDate"]["description"] == "text"


def _triples(rows):
    return pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "obj_kind", "entity_class", "doc_id"]
    )


@pytest.fixture()
def planted(ray_session):
    import ray.data

    node = lambda **kw: json.dumps(kw, sort_keys=True, ensure_ascii=False)
    rows = [
        # valid: day / month / year precision
        ("p1", "birthDate", node(**{"@value": "1923-01-02", "description": "x"}), "node", "persons", "p1"),
        ("p2", "birthDate", node(**{"@value": "1923-01"}), "node", "persons", "p2"),
        ("p3", "birthDate", node(**{"@value": "1923"}), "node", "persons", "p3"),
        # declared subfield absent (description-only node) — typed gap, not a violation
        ("p4", "birthDate", node(description="um 1900"), "node", "persons", "p4"),
        # present but malformed — ES would reject at index time
        ("p5", "birthDate", node(**{"@value": "19.1.1923"}), "node", "persons", "p5"),
        # shape violation: literal where an object is declared
        ("p6", "birthDate", "1923", "literal", "persons", "p6"),
        # resources use dateParsed, not @value
        ("r1", "datePublished", node(dateOrigin="1877", dateParsed="1877"), "node", "resources", "r1"),
        ("r2", "datePublished", node(dateOrigin="1870-1880"), "node", "resources", "r2"),
        # undeclared (class, pred) pairs are out of scope
        ("w1", "datePublished", node(dateParsed="bogus!"), "node", "works", "w1"),
        ("p7", "preferredName", "Ada", "literal", "persons", "p7"),
    ]
    return ray.data.from_pandas(_triples(rows))


def test_typing_report_counts(planted):
    rep = (
        schema_typing_report(planted, num_partitions=2)
        .to_pandas()
        .sort_values(["entity_class", "pred"])
        .reset_index(drop=True)
    )
    assert rep.to_dict("records") == [
        {
            "entity_class": "persons", "pred": "birthDate",
            "n_triples": 6, "n_node": 5, "n_value": 4, "n_valid": 3, "n_invalid": 1,
        },
        {
            "entity_class": "resources", "pred": "datePublished",
            "n_triples": 2, "n_node": 2, "n_value": 1, "n_valid": 1, "n_invalid": 0,
        },
    ]


def test_schema_checks_expectations_gate(planted):
    from esmarc_ray.ops.relational import expectations

    out = expectations(planted, schema_checks()).to_pandas()
    out = out.set_index("check")
    # every check sees every row; only the malformed birthDate row violates
    assert int(out.loc["persons.birthDate.@value:date", "n_violations"]) == 1
    assert int(out.loc["resources.datePublished.dateParsed:date", "n_violations"]) == 0
    assert set(out.index) == {
        f"{c}.{p}.{s}:date" for c, p, s in date_typed_fields()
    }
    assert (out["n_rows"] == 10).all()


def test_corpus_is_conformant(ray_session, tmp_path):
    """The engine's own emission must satisfy the declared schema — zero
    invalid values over the fixture corpus."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    from esmarc_ray.stages.extract import docs_to_triples

    triples = docs_to_triples(entrymod._kg_docs("/root/testdata/sf0.001"))
    rep = schema_typing_report(triples).to_pandas()
    assert len(rep) > 0
    assert int(rep["n_invalid"].sum()) == 0
    assert (rep["n_node"] == rep["n_triples"]).all()
    # the declared date subfield is actually exercised by the corpus
    assert int(rep["n_valid"].sum()) > 0
