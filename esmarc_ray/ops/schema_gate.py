"""Declared output-schema typing gate over the triple table.

The reference declares the type of every emitted subfield in one
Elasticsearch index mapping per entity class (reference
mapping/persons.json:53-77 types ``birthDate.@value`` as ``date``; 7 files,
one per class).  The engine carries those declarations as extracted data
(``esmarc_ray/data/output_schema.json``, written by
``tools/extract_output_schema.py``) and enforces the contract over the
(subj, pred, obj) triple table: for every (entity_class, predicate) whose
declared subfield is date-typed, the emitted node's subfield must be a
partial ISO date ``YYYY[-MM[-DD]]`` — exactly what the extraction kernel's
``format_by_period`` emits and what ES ``strict_date_optional_time``
accepts.

Scale shape: a single ``map_batches`` pass computes per-batch partial
counts (combiner), merged by a small hash-partitioned final — no shuffle of
the triples themselves.  JSON parsing only touches rows whose
(entity_class, pred) is declared date-typed, a tiny slice of the table.
"""

from __future__ import annotations

import json
import pathlib
import re
from typing import Callable

import pandas as pd
import ray.data

from esmarc_ray.config import derive_width


_SCHEMA_PATH = pathlib.Path(__file__).resolve().parent.parent / "data" / "output_schema.json"

# entity_class -> pred -> subfield -> es_type (reference mapping/*.json)
OUTPUT_SCHEMA: dict[str, dict[str, dict[str, str]]] = json.loads(_SCHEMA_PATH.read_text())

# What format_by_period emits (year / month / day precision) and what the
# reference's ES date type accepts as strict_date_optional_time.
DATE_RE = re.compile(r"\d{4}(-\d{2}(-\d{2})?)?")

# NUL would be the natural separator but numpy's fixed-width unicode strips
# trailing NULs as padding during pandas concat; \x1f survives and appears in
# no entity class or predicate name.
_SEP = "\x1f"


def date_typed_fields() -> list[tuple[str, str, str]]:
    """Sorted (entity_class, pred, subfield) rows declared ``date`` by the
    reference's index mappings."""
    out = []
    for entity_class, preds in OUTPUT_SCHEMA.items():
        for pred, subs in preds.items():
            for subfield, es_type in subs.items():
                if es_type == "date":
                    out.append((entity_class, pred, subfield))
    return sorted(out)


def _subfield_by_key() -> dict[str, str]:
    return {f"{c}{_SEP}{p}": s for c, p, s in date_typed_fields()}


def _extract_values(df: pd.DataFrame, sub_by_key: dict[str, str]) -> pd.DataFrame:
    """Rows for declared date-typed (class, pred) pairs, annotated with the
    node flag, extracted subfield value and validity.  Non-JSON-object objs
    (obj_kind != 'node') count as shape violations via is_node=False."""
    key = df["entity_class"] + _SEP + df["pred"]
    hit = df[key.isin(sub_by_key)].copy()
    if hit.empty:
        hit["is_node"] = pd.Series(dtype=bool)
        hit["value"] = pd.Series(dtype=object)
        hit["is_valid"] = pd.Series(dtype=bool)
        return hit
    hit["is_node"] = hit["obj_kind"].eq("node")
    subfields = (hit["entity_class"] + _SEP + hit["pred"]).map(sub_by_key)
    values = []
    for obj, is_node, subfield in zip(hit["obj"], hit["is_node"], subfields):
        if not is_node:
            values.append(None)
            continue
        v = json.loads(obj).get(subfield)
        values.append(v if isinstance(v, str) else None)
    hit["value"] = values
    hit["is_valid"] = [v is not None and DATE_RE.fullmatch(v) is not None for v in values]
    return hit


@derive_width
def schema_typing_report(
    triples: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-(entity_class, pred) conformance counts against the declared
    output schema: n_triples, n_node (JSON-object shaped), n_value (declared
    date subfield present), n_valid (parses as partial ISO date), n_invalid
    (present but malformed — what ES would reject at index time)."""
    from esmarc_ray.ops.relational import partitioned_final

    sub_by_key = _subfield_by_key()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hit = _extract_values(df, sub_by_key)
        if hit.empty:
            return pd.DataFrame(
                {
                    "entity_class": pd.Series(dtype=str),
                    "pred": pd.Series(dtype=str),
                    "n_triples": pd.Series(dtype="int64"),
                    "n_node": pd.Series(dtype="int64"),
                    "n_value": pd.Series(dtype="int64"),
                    "n_valid": pd.Series(dtype="int64"),
                    "n_invalid": pd.Series(dtype="int64"),
                }
            )
        hit["n_triples"] = 1
        hit["n_node"] = hit["is_node"].astype("int64")
        hit["n_value"] = hit["value"].notna().astype("int64")
        hit["n_valid"] = hit["is_valid"].astype("int64")
        hit["n_invalid"] = hit["n_value"] - hit["n_valid"]
        return hit.groupby(["entity_class", "pred"], as_index=False, sort=False)[
            ["n_triples", "n_node", "n_value", "n_valid", "n_invalid"]
        ].sum()

    def final(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(["entity_class", "pred"], as_index=False, sort=False)[
            ["n_triples", "n_node", "n_value", "n_valid", "n_invalid"]
        ].sum()

    return partitioned_final(
        triples.map_batches(partial, batch_format="pandas"),
        ["entity_class", "pred"],
        final,
        num_partitions=num_partitions,
    )


def schema_checks() -> dict[str, Callable[[pd.DataFrame], pd.Series]]:
    """Named row-level predicates for :func:`esmarc_ray.ops.relational.
    expectations` over the triple table — one check per declared date-typed
    field; a row passes unless it belongs to that (class, pred) and carries
    a present-but-malformed subfield value."""
    checks: dict[str, Callable[[pd.DataFrame], pd.Series]] = {}
    for entity_class, pred, subfield in date_typed_fields():
        sub_by_key = {f"{entity_class}{_SEP}{pred}": subfield}

        def check(df: pd.DataFrame, sub_by_key=sub_by_key) -> pd.Series:
            ok = pd.Series(True, index=df.index)
            hit = _extract_values(df, sub_by_key)
            if not hit.empty:
                bad = hit.index[hit["value"].notna() & ~hit["is_valid"]]
                ok.loc[bad] = False
            return ok

        checks[f"{entity_class}.{pred}.{subfield}:date"] = check
    return checks
