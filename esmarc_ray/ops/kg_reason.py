"""KG reasoning / profiling / validation operators over the triple table.

The reference emits a flat schema.org graph and leaves consumption-side
semantics (dataset statistics, subclass inference, inverse properties, shape
validation) to Elasticsearch consumers; here they are first-class distributed
operators over the (subj, pred, obj, obj_kind, entity_class, doc_id) triple
Dataset the engine materializes (reference output shape:
reference/esmarc/esmarc.py:311-319 — one JSON-LD doc per subject).

Scale notes common to every op here: instance data (triples) only ever moves
through ``map_batches`` combiners and hash-partitioned reducers; *schema*
artifacts (a class taxonomy, an inverse-property map, a shape list) are
metadata-small by construction and travel as broadcast closures — the same
broadcast-small-side rule as the linker's lookup tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


from esmarc_ray.ops.relational import partial_groupby_agg, partitioned_final

from esmarc_ray.config import derive_width


@derive_width
def void_stats(
    triples: ray.data.Dataset,
    *,
    class_column: str = "entity_class",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """VoID-style dataset statistics per entity class: triple count and
    exact distinct subject / predicate / object counts — the standard RDF
    dataset description a KG publisher ships next to the dump (W3C VoID:
    ``void:triples``, ``void:distinctSubjects``, ``void:properties``,
    ``void:distinctObjects``).

    Distinct counting is exact and fully distributed: each batch melts to
    locally-deduped ``(class, stat, val)`` rows, the rows hash-partition on
    the FULL dedup key (so partition-local dedup is globally correct), and
    per-partition distinct counts sum.  Returns (entity_class, stat, n) in
    long form.
    """

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        parts = [
            pd.DataFrame(
                {
                    "cls": batch[class_column],
                    "stat": stat,
                    "val": batch[col].astype(str),
                }
            ).drop_duplicates()
            for stat, col in (
                ("distinct_subjects", "subj"),
                ("distinct_predicates", "pred"),
                ("distinct_objects", "obj"),
            )
        ]
        return pd.concat(parts, ignore_index=True)

    def count_distinct(part: pd.DataFrame) -> pd.DataFrame:
        d = part.drop_duplicates()
        g = d.groupby(["cls", "stat"]).size().reset_index(name="n_part")
        return g

    distincts = partial_groupby_agg(
        partitioned_final(
            triples.map_batches(melt, batch_format="pandas"),
            ["cls", "stat", "val"],
            count_distinct,
            num_partitions=num_partitions,
        ),
        ["cls", "stat"],
        {"n": ("n_part", "sum")},
    )

    totals = partial_groupby_agg(
        triples.map_batches(
            lambda b: pd.DataFrame({"cls": b[class_column], "stat": "triples"}),
            batch_format="pandas",
        ),
        ["cls", "stat"],
        {"n": ("stat", "count")},
    )
    return distincts.union(totals).map_batches(
        lambda b: b.rename(columns={"cls": class_column}), batch_format="pandas"
    )


def subclass_closure(edges: list[tuple[str, str]]) -> dict[str, list[str]]:
    """Reflexive-transitive closure of an ``rdfs:subClassOf`` edge list:
    type → sorted list of all supertypes INCLUDING itself.

    The taxonomy is schema metadata (tens to thousands of classes, never
    instance-scaled), so the closure is computed driver-side and broadcast —
    the correct plan at any corpus size; only the *instance* join below is
    distributed.  Cycles are tolerated (fixpoint iteration).
    """
    supers: dict[str, set[str]] = {}
    for child, parent in edges:
        supers.setdefault(child, {child}).add(parent)
        supers.setdefault(parent, {parent})
    changed = True
    while changed:
        changed = False
        for child in supers:
            add = set()
            for p in supers[child]:
                add |= supers.get(p, {p})
            if not add <= supers[child]:
                supers[child] |= add
                changed = True
    return {t: sorted(s) for t, s in supers.items()}


@derive_width
def rdfs_type_counts(
    triples: ray.data.Dataset,
    taxonomy_edges: list[tuple[str, str]],
    *,
    type_pred: str = "@type",
    class_column: str = "entity_class",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """RDFS subClassOf materialization, counted: every subject's direct
    ``@type`` expands to all transitive supertypes (reflexive), and the op
    returns exact distinct-subject counts per (entity_class, inferred_type).

    This is the standard forward-chaining ``rdfs9`` rule (x type C, C sub D
    ⇒ x type D) as a broadcast map-side join: the closure dict rides the
    task closure; subjects never shuffle except for the final distinct.
    """
    closure = subclass_closure(taxonomy_edges)

    def infer(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["pred"] == type_pred]
        if not len(m):
            return pd.DataFrame(
                {"cls": pd.Series(dtype=str), "inferred_type": pd.Series(dtype=str),
                 "subj": pd.Series(dtype=str)}
            )
        sup = m["obj"].map(lambda t: closure.get(t, [t]))
        counts = sup.str.len().to_numpy()
        return pd.DataFrame(
            {
                "cls": np.repeat(m[class_column].to_numpy(), counts),
                "inferred_type": np.concatenate(sup.to_numpy()),
                "subj": np.repeat(m["subj"].to_numpy(), counts),
            }
        ).drop_duplicates()

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.drop_duplicates()
            .groupby(["cls", "inferred_type"])
            .size()
            .reset_index(name="n_part")
        )

    return partial_groupby_agg(
        partitioned_final(
            triples.map_batches(infer, batch_format="pandas"),
            ["cls", "inferred_type", "subj"],
            count_part,
            num_partitions=num_partitions,
        ),
        ["cls", "inferred_type"],
        {"n_subjects": ("n_part", "sum")},
    ).map_batches(
        lambda b: b.rename(columns={"cls": class_column}), batch_format="pandas"
    )


def inverse_triples(
    triples: ray.data.Dataset,
    inverse_map: dict[str, str],
    ref_pattern: str,
) -> ray.data.Dataset:
    """``owl:inverseOf`` materialization: for every triple (s, p, o) whose
    predicate has a declared inverse and whose object payload references an
    internal entity (``ref_pattern`` extracts its @id URI), emit the inverse
    triple (o_ref, inverse(p), s).  Symmetric predicates map to themselves.

    Map-only and zero-shuffle: the inverse map is metadata-small; the regex
    extraction is vectorized ``str.extract``.  Output columns
    (subj, pred, obj) — obj is the original subject URI (a node ref).
    """

    preds = sorted(inverse_map)

    def invert(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["pred"].isin(preds)]
        if not len(m):
            return pd.DataFrame(
                {"subj": pd.Series(dtype=str), "pred": pd.Series(dtype=str),
                 "obj": pd.Series(dtype=str)}
            )
        ref = m["obj"].str.extract(ref_pattern, expand=False)
        keep = ref.notna()
        m = m[keep]
        return pd.DataFrame(
            {
                "subj": ref[keep],
                "pred": m["pred"].map(inverse_map),
                "obj": m["subj"],
            }
        ).reset_index(drop=True)

    return triples.map_batches(invert, batch_format="pandas")


@derive_width
def shacl_cardinality_report(
    triples: ray.data.Dataset,
    shapes: list[dict],
    *,
    class_column: str = "entity_class",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SHACL-lite cardinality validation: each shape is
    ``{"entity_class": C, "pred": P, "min_count": m, "max_count": M}``
    (either bound optional) and the report row carries how many of class
    C's subjects violate it — ``n_checked`` = distinct subjects of the
    class, ``n_violations`` = subjects with fewer than ``min_count`` or
    more than ``max_count`` P-triples.

    Plan: one combiner pass builds exact per-(class, subj, pred) counts for
    the shaped predicates only (hash-partitioned partial sums — never one
    task per subject), a second tiny pass builds per-class subject totals;
    the per-shape arithmetic folds over the small grouped outputs.  The
    shape list is metadata-small and rides the closures.
    """
    shaped = sorted({(s["entity_class"], s["pred"]) for s in shapes})
    classes = sorted({c for c, _ in shaped})

    def pred_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized (class, pred) membership: one boolean kernel per shape
        # pair (the shape list is metadata-small), never a per-row tuple apply
        mask = np.zeros(len(batch), dtype=bool)
        for cls, pred in shaped:
            mask |= (batch[class_column] == cls).to_numpy() & (
                batch["pred"] == pred
            ).to_numpy()
        m = batch[mask]
        return pd.DataFrame(
            {"cls": m[class_column], "subj": m["subj"], "pred": m["pred"]}
        )

    per_subj = partial_groupby_agg(
        triples.map_batches(pred_rows, batch_format="pandas"),
        ["cls", "subj", "pred"],
        {"cnt": ("pred", "count")},
        num_partitions=num_partitions,
    )

    def subj_rows(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch[class_column].isin(classes)]
        return pd.DataFrame({"cls": m[class_column], "subj": m["subj"]}).drop_duplicates()

    def count_subj(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.drop_duplicates().groupby("cls").size().reset_index(name="n_part")
        )

    class_totals = partial_groupby_agg(
        partitioned_final(
            triples.map_batches(subj_rows, batch_format="pandas"),
            ["cls", "subj"],
            count_subj,
            num_partitions=num_partitions,
        ),
        ["cls"],
        {"n_checked": ("n_part", "sum")},
    ).to_pandas()
    totals = dict(zip(class_totals["cls"], class_totals["n_checked"]))

    # per-(class, pred): subjects with >=1 triple, and subjects over each
    # shape's max bound — folded from the grouped counts, still distributed
    def shape_partials(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s in shapes:
            m = batch[(batch["cls"] == s["entity_class"]) & (batch["pred"] == s["pred"])]
            n_ok_min = (
                int((m["cnt"] >= s["min_count"]).sum())
                if s.get("min_count")
                else int(len(m))
            )
            n_over = (
                int((m["cnt"] > s["max_count"]).sum())
                if s.get("max_count") is not None
                else 0
            )
            rows.append(
                {
                    "entity_class": s["entity_class"],
                    "pred": s["pred"],
                    "constraint": _shape_label(s),
                    "n_ok_min": n_ok_min,
                    "n_over": n_over,
                }
            )
        return pd.DataFrame(rows)

    partials = partial_groupby_agg(
        per_subj.map_batches(shape_partials, batch_format="pandas"),
        ["entity_class", "pred", "constraint"],
        {"n_ok_min": ("n_ok_min", "sum"), "n_over": ("n_over", "sum")},
    ).to_pandas()
    if partials.empty:
        # no shaped predicate appears anywhere: every min-shape is violated
        # by every checked subject, handled by the complement arithmetic below
        partials = pd.DataFrame(
            columns=["entity_class", "pred", "constraint", "n_ok_min", "n_over"]
        )

    out = []
    for s in shapes:
        row = partials[
            (partials["entity_class"] == s["entity_class"])
            & (partials["pred"] == s["pred"])
            & (partials["constraint"] == _shape_label(s))
        ]
        n_ok_min = int(row["n_ok_min"].iloc[0]) if len(row) else 0
        n_over = int(row["n_over"].iloc[0]) if len(row) else 0
        n_checked = int(totals.get(s["entity_class"], 0))
        n_viol = 0
        if s.get("min_count"):
            # subjects with ZERO P-triples never appear in per_subj, so they
            # count as min-violations via the class-total complement
            n_viol += n_checked - n_ok_min
        if s.get("max_count") is not None:
            n_viol += n_over
        out.append(
            {
                "entity_class": s["entity_class"],
                "pred": s["pred"],
                "constraint": _shape_label(s),
                "n_checked": n_checked,
                "n_violations": n_viol,
            }
        )
    return pd.DataFrame(out).sort_values(
        ["entity_class", "pred", "constraint"]
    ).reset_index(drop=True)


@derive_width
def property_table(
    triples: ray.data.Dataset,
    preds: list[str],
    *,
    entity_class: str | None = None,
    class_column: str = "entity_class",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """RDF property-table transform: the row-store layout triple stores build
    for star-query speed — one row per subject, one column per requested
    predicate, ``min(obj)`` when a predicate is multi-valued (deterministic,
    SQL-reproducible choice), null when absent.

    Subjects hash-partition ONCE (all of a subject's triples co-locate), each
    partition pivots with a single vectorized groupby+unstack — never a task
    or a Python loop per subject.  ``preds`` is the declared output schema
    and is metadata-small."""

    preds = list(preds)

    def narrow(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch
        if entity_class is not None:
            m = m[m[class_column] == entity_class]
        m = m[m["pred"].isin(preds)]
        return m[["subj", "pred", "obj"]]

    def pivot(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame(columns=["subj"] + preds)
        g = part.groupby(["subj", "pred"])["obj"].min().unstack("pred")
        # keep absent predicates as object-typed None columns so every
        # partition's block carries the same Arrow string schema (a reindex
        # NaN column would otherwise type as float64 and break the union)
        g = g.reindex(columns=preds).astype(object)
        g = g.where(g.notna(), None)
        out = g.reset_index()
        out.columns = ["subj"] + preds
        return out

    return partitioned_final(
        triples.map_batches(narrow, batch_format="pandas"),
        ["subj"],
        pivot,
        num_partitions=num_partitions,
    )


@derive_width
def entity_summaries(
    triples: ray.data.Dataset,
    k: int = 3,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Entity summarization: per subject keep the ``k`` globally-RAREST
    facts (predicate frequency ascending, then pred/obj lexicographic
    tie-break) — the informativeness-ranked "entity card" a KG front-end
    renders, rarity standing in for IDF.

    The predicate-frequency table is metadata-small (one row per distinct
    predicate) and broadcast; subjects hash-partition ONCE and each
    partition's top-k is a single vectorized sort + cumcount — never a task
    or Python loop per subject.  Output: (subj, pred, obj, rank)."""

    freq = partial_groupby_agg(
        triples.map_batches(lambda b: b[["pred"]], batch_format="pandas"),
        ["pred"],
        {"nf": ("pred", "count")},
    ).to_pandas()
    nf = dict(zip(freq["pred"], freq["nf"].astype("int64")))

    def narrow(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["subj", "pred", "obj"]].copy()
        out["__nf"] = out["pred"].map(nf).astype("int64")
        return out

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["subj", "__nf", "pred", "obj"], kind="mergesort"
        )
        part = part.assign(rank=(part.groupby("subj").cumcount() + 1))
        part = part[part["rank"] <= k]
        return part[["subj", "pred", "obj", "rank"]]

    return partitioned_final(
        triples.map_batches(narrow, batch_format="pandas"),
        ["subj"],
        topk,
        num_partitions=num_partitions,
    )


def _shape_label(s: dict) -> str:
    parts = []
    if s.get("min_count"):
        parts.append(f"minCount={s['min_count']}")
    if s.get("max_count") is not None:
        parts.append(f"maxCount={s['max_count']}")
    return ",".join(parts)
