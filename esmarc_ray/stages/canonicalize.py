"""Canonicalization: merge entity docs that share a normalized entity key.

The reference has NO cross-record operators (SURVEY.md §2.5) — this stage is
the north rule's addition.  Design:

* key: ``canon_key`` computed at extract time (GND id > ISIL+PPN > @id);
* skew: head entities (ubiquitous GND subjects) make a naive
  ``groupby(canon_key)`` shuffle hot — so the merge runs in two phases:
  a PARTIAL merge grouped on ``(canon_key, salt)`` where ``salt =
  hash(doc_id) % n_salts`` splits a hot key across reducers, then a FINAL
  merge on ``canon_key`` alone over the (much smaller) partials.  Associative
  + commutative merge ⇒ salted == unsalted (tested).
* merge semantics: representative = smallest doc_id (deterministic);
  predicates union with order-stable dedup; the merged doc records its
  members under ``_merged_from``.

At cluster scale both groupbys are hash shuffles; the partial phase bounds
the biggest reduce task at ~|head|/n_salts rows.
"""

from __future__ import annotations

import json
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from esmarc_ray.values import merge_value

MERGEABLE = ("sameAs", "about", "mentions", "_merged_from")


def merge_docs(docs: list[tuple[str, dict]]) -> tuple[str, dict]:
    """Merge docs about one real-world entity; returns (doc_id, merged doc).

    Associative/commutative up to the deterministic representative choice:
    the smallest doc_id's doc wins scalar fields; list-valued link/subject
    predicates union (order-stable dedup); members are tracked.
    """
    docs = sorted(docs, key=lambda pair: pair[0])
    rep_id, merged = docs[0][0], dict(docs[0][1])
    members = merged.pop("_merged_from", None) or [rep_id]
    for doc_id, doc in docs[1:]:
        for member in doc.get("_merged_from") or [doc_id]:
            if member not in members:
                members.append(member)
        for pred, value in doc.items():
            if pred in ("@id", "_merged_from"):
                continue
            if pred not in merged:
                merged[pred] = value
            elif pred in MERGEABLE or isinstance(merged.get(pred), list):
                merged[pred] = merge_value(merged[pred], value)
            # scalar conflict: representative wins (deterministic)
    if len(members) > 1 or docs[0][1].get("_merged_from"):
        merged["_merged_from"] = sorted(members)
    return rep_id, merged


def _salt(doc_id: str, n_salts: int) -> int:
    return zlib.crc32(doc_id.encode()) % n_salts


def _merge_group(batch: pa.Table) -> pa.Table:
    """map_groups body: merge all rows of one (salted) key into one row."""
    doc_ids = batch.column("doc_id").to_pylist()
    doc_jsons = batch.column("doc_json").to_pylist()
    gnd_lists = batch.column("gnd_ids").to_pylist()
    pairs = [(doc_id, json.loads(doc_json)) for doc_id, doc_json in zip(doc_ids, doc_jsons)]
    rep_id, merged = merge_docs(pairs)
    gnd_union: list[str] = []
    for ids in gnd_lists:
        gnd_union = merge_value(gnd_union, list(ids or []))
    from esmarc_ray.stages.extract import DOC_SCHEMA

    out = {
        "doc_id": [rep_id],
        "entity_class": [batch.column("entity_class")[0].as_py()],
        "canon_key": [batch.column("canon_key")[0].as_py()],
        "doc_json": [json.dumps(merged, sort_keys=True, ensure_ascii=False)],
        "gnd_ids": [list(gnd_union)],
        "error": [""],
    }
    schema = DOC_SCHEMA
    if "n_links_added" in batch.schema.names:
        out["n_links_added"] = [int(pc.sum(batch.column("n_links_added")).as_py() or 0)]
        schema = schema.append(pa.field("n_links_added", pa.int64()))
    return pa.Table.from_pydict(out, schema=schema)


def canonicalize(
    docs: ray.data.Dataset,
    *,
    n_salts: int = 16,
    salted: bool = True,
) -> ray.data.Dataset:
    """Two-phase (salted partial → final) canonical merge on ``canon_key``.

    ``salted=False`` runs the single-shuffle variant (used by the
    salted==unsalted correctness gate; also fine for small inputs).
    """
    live = docs.filter(
        expr="entity_class != '_error' and entity_class != '_dropped'"
    )
    if salted:
        live = live.map_batches(_AddSalt(n_salts), batch_format="pyarrow", zero_copy_batch=True)
        partial = live.groupby(["canon_key", "salt"]).map_groups(
            _merge_group, batch_format="pyarrow"
        )
        return partial.groupby("canon_key").map_groups(_merge_group, batch_format="pyarrow")
    return live.groupby("canon_key").map_groups(_merge_group, batch_format="pyarrow")


class _AddSalt:
    def __init__(self, n_salts: int):
        self.n_salts = n_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        salts = [_salt(d, self.n_salts) for d in batch.column("doc_id").to_pylist()]
        return batch.append_column("salt", pa.array(salts, pa.int32()))


def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Exact (subj, pred, obj) dedup — hash-partitioned groupby, first wins."""

    def first_per_key(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 1)

    return triples.groupby(["subj", "pred", "obj"]).map_groups(
        first_per_key, batch_format="pyarrow"
    )
