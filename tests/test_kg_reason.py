"""Unit tests for the KG reasoning/validation operators (ops/kg_reason.py)
against hand-computed answers on small synthetic triple tables."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from esmarc_ray.ops.kg_reason import (
    inverse_triples,
    property_table,
    rdfs_type_counts,
    shacl_cardinality_report,
    subclass_closure,
    void_stats,
)

REF_RE = r'"@id": "(https://data\.slub-dresden\.de/[a-z]+/[^"]+)"'


def _triples(rows):
    cols = ["subj", "pred", "obj", "entity_class"]
    df = pd.DataFrame(rows, columns=cols)
    # many tiny blocks so partition-correctness (not block luck) is tested
    return ray.data.from_pandas(df).repartition(5)


def test_subclass_closure_transitive_and_cyclic():
    closure = subclass_closure([("A", "B"), ("B", "C")])
    assert closure["A"] == ["A", "B", "C"]
    assert closure["B"] == ["B", "C"]
    assert closure["C"] == ["C"]
    # cycles converge to the strongly-connected component's union
    cyc = subclass_closure([("X", "Y"), ("Y", "X")])
    assert cyc["X"] == ["X", "Y"] and cyc["Y"] == ["X", "Y"]


def test_void_stats_exact_distincts(ray_session):
    ds = _triples(
        [
            ("s1", "p1", "o1", "c1"),
            ("s1", "p1", "o1", "c1"),  # duplicate triple: counts, not distinct
            ("s1", "p2", "o2", "c1"),
            ("s2", "p1", "o1", "c1"),
            ("s3", "p1", "o9", "c2"),
        ]
    )
    out = void_stats(ds).to_pandas()
    got = {
        (r.entity_class, r.stat): r.n
        for r in out.itertuples()
    }
    assert got[("c1", "triples")] == 4
    assert got[("c1", "distinct_subjects")] == 2
    assert got[("c1", "distinct_predicates")] == 2
    assert got[("c1", "distinct_objects")] == 2
    assert got[("c2", "triples")] == 1
    assert got[("c2", "distinct_subjects")] == 1


def test_rdfs_type_counts_expands_supertypes(ray_session):
    ds = _triples(
        [
            ("s1", "@type", "A", "c1"),
            ("s2", "@type", "A", "c1"),
            ("s2", "@type", "A", "c1"),  # dup @type: subjects stay distinct
            ("s3", "@type", "B", "c1"),
            ("s4", "@type", "Z", "c2"),  # not in taxonomy: reflexive only
            ("s5", "other", "A", "c1"),  # non-type triples ignored
        ]
    )
    out = rdfs_type_counts(ds, [("A", "B"), ("B", "C")]).to_pandas()
    got = {
        (r.entity_class, r.inferred_type): r.n_subjects for r in out.itertuples()
    }
    assert got[("c1", "A")] == 2
    assert got[("c1", "B")] == 3  # s1, s2 via A<B plus s3 direct
    assert got[("c1", "C")] == 3
    assert got[("c2", "Z")] == 1
    assert ("c1", "Z") not in got


def test_inverse_triples_maps_and_filters(ray_session):
    node = '{"@id": "https://data.slub-dresden.de/persons/123", "name": "x"}'
    ds = _triples(
        [
            ("s1", "contributor", node, "resources"),
            ("s2", "isPartOf", '{"no_ref": true}', "resources"),  # no @id
            ("s3", "other", node, "resources"),  # pred not declared
            ("s4", "sameAs", node, "persons"),  # symmetric
        ]
    ).drop_columns(["entity_class"])
    inv = {"contributor": "contributorTo", "isPartOf": "hasPart",
           "sameAs": "sameAs"}
    out = inverse_triples(ds, inv, REF_RE).to_pandas()
    rows = set(map(tuple, out[["subj", "pred", "obj"]].to_numpy()))
    assert rows == {
        ("https://data.slub-dresden.de/persons/123", "contributorTo", "s1"),
        ("https://data.slub-dresden.de/persons/123", "sameAs", "s4"),
    }


def test_shacl_cardinality_min_max(ray_session):
    ds = _triples(
        [
            # s1: name x2 (max violation), s2: name x1 (ok), s3: none (min viol)
            ("s1", "name", "a", "c1"),
            ("s1", "name", "b", "c1"),
            ("s2", "name", "a", "c1"),
            ("s3", "other", "a", "c1"),
            # class c2 out of shape scope
            ("s9", "name", "a", "c2"),
        ]
    ).drop_columns(["obj"])
    shapes = [
        {"entity_class": "c1", "pred": "name", "min_count": 1, "max_count": 1},
        {"entity_class": "c1", "pred": "other", "max_count": 2},
    ]
    out = shacl_cardinality_report(ds, shapes)
    by = {(r.entity_class, r.pred): r for r in out.itertuples()}
    name = by[("c1", "name")]
    assert name.n_checked == 3
    assert name.constraint == "minCount=1,maxCount=1"
    assert name.n_violations == 2  # s3 missing + s1 over
    other = by[("c1", "other")]
    assert other.n_checked == 3 and other.n_violations == 0


def test_property_table_pivot_min_and_nulls(ray_session):
    ds = _triples(
        [
            ("s1", "name", "zeta", "c1"),
            ("s1", "name", "alpha", "c1"),  # multi-valued -> min
            ("s1", "born", "1901", "c1"),
            ("s2", "name", "beta", "c1"),  # born absent -> null
            ("s3", "other", "x", "c1"),  # no shaped pred -> no row
            ("s9", "name", "gamma", "c2"),  # filtered by class
        ]
    )
    out = (
        property_table(ds, ["name", "born"], entity_class="c1")
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["subj", "name", "born"]
    assert out["subj"].tolist() == ["s1", "s2"]
    assert out["name"].tolist() == ["alpha", "beta"]
    assert out.loc[0, "born"] == "1901"
    assert out.loc[1, "born"] is None or pd.isna(out.loc[1, "born"])


def test_shacl_empty_pred_never_seen(ray_session):
    ds = _triples([("s1", "name", "a", "c1")]).drop_columns(["obj"])
    out = shacl_cardinality_report(
        ds, [{"entity_class": "c1", "pred": "ghost", "min_count": 1}]
    )
    assert out.loc[0, "n_checked"] == 1
    assert out.loc[0, "n_violations"] == 1


def test_entity_summaries_rarest_first(ray_session):
    ds = _triples(
        [
            # common pred (3 uses), rare preds (1 use each)
            ("s1", "common", "c1v", "c1"),
            ("s2", "common", "c2v", "c1"),
            ("s3", "common", "c3v", "c1"),
            ("s1", "rare1", "r1", "c1"),
            ("s1", "rare2", "r2", "c1"),
            ("s1", "zrare", "r3", "c1"),
        ]
    ).drop_columns(["entity_class"])
    from esmarc_ray.ops.kg_reason import entity_summaries

    out = (
        entity_summaries(ds, k=3)
        .to_pandas()
        .sort_values(["subj", "rank"])
        .reset_index(drop=True)
    )
    s1 = out[out["subj"] == "s1"]
    # the 3 rare facts outrank the common one; pred lexicographic tie-break
    assert s1["pred"].tolist() == ["rare1", "rare2", "zrare"]
    assert s1["rank"].tolist() == [1, 2, 3]
    assert out[out["subj"] == "s2"]["pred"].tolist() == ["common"]
