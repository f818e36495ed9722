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

Physical plan: the natural ``groupby(canon_key).map_groups(merge)`` spends
one UDF task + one Arrow table per group — ruinous with ~1 group per input
row (millions of one-doc entities).  Instead the merge hash-partitions on
``hash(key) % num_partitions`` (a column added batch-side), groups on the
PARTITION id — so the shuffle moves the same bytes but the reducer runs once
per partition — and merges all key-runs inside a partition in plain Python.
``num_partitions`` bounds reducer memory at ~|input|/P rows; at cluster
scale raise it with the data (it is the analogue of Spark's
``spark.sql.shuffle.partitions``).
"""

from __future__ import annotations

import json
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from esmarc_ray.values import merge_value

from esmarc_ray.config import derive_width

MERGEABLE = ("sameAs", "about", "mentions", "_merged_from")


def _dedup_key(value) -> str:
    """Canonical identity of a JSON value for set-based union dedup."""
    if isinstance(value, str):
        return "s:" + value
    return "j:" + json.dumps(value, sort_keys=True, ensure_ascii=False)


def merge_docs(docs: list[tuple[str, dict]]) -> tuple[str, dict]:
    """Merge docs about one real-world entity; returns (doc_id, merged doc).

    Associative/commutative up to the deterministic representative choice:
    the smallest doc_id's doc wins scalar fields; list-valued link/subject
    predicates union (order-stable dedup); members are tracked.

    Union dedup is SET-keyed on the canonical JSON of each element — a
    linear-scan ``not in`` here is quadratic in group size and turns a head
    entity (10^4+ docs behind one GND key) into a straggler task.

    Plan-invariance: whenever a union actually GROWS the representative's
    list, the result is re-sorted by the element dedup key.  That makes the
    merged list a pure function of the element SET — any merge tree (unsalted
    single-phase, salted two-phase, block-local pre-combine) yields either
    the representative's raw order (nothing added) or ``sorted(final set)``,
    so every plan agrees bit-for-bit regardless of how docs were grouped.
    """
    docs = sorted(docs, key=lambda pair: pair[0])
    rep_id, merged = docs[0][0], dict(docs[0][1])
    members = merged.pop("_merged_from", None) or [rep_id]
    member_set = set(members)
    seen: dict[str, set[str]] = {}
    grew: set[str] = set()

    def union_into(pred: str, value) -> None:
        acc = merged[pred]
        if not isinstance(acc, list):
            acc = [acc]
            merged[pred] = acc
        if pred not in seen:
            seen[pred] = {_dedup_key(x) for x in acc}
        keys = seen[pred]
        for element in value if isinstance(value, list) else [value]:
            key = _dedup_key(element)
            if key not in keys:
                keys.add(key)
                acc.append(element)
                grew.add(pred)

    for doc_id, doc in docs[1:]:
        for member in doc.get("_merged_from") or [doc_id]:
            if member not in member_set:
                member_set.add(member)
                members.append(member)
        for pred, value in doc.items():
            if pred in ("@id", "_merged_from"):
                continue
            if pred not in merged:
                merged[pred] = value
                seen.pop(pred, None)
            elif pred in MERGEABLE or isinstance(merged.get(pred), list):
                union_into(pred, value)
            # scalar conflict: representative wins (deterministic)
    for pred in grew:
        merged[pred] = sorted(merged[pred], key=_dedup_key)
    if len(members) > 1 or docs[0][1].get("_merged_from"):
        merged["_merged_from"] = sorted(members)
    return rep_id, merged


def _hash_mod_col(col, mod: int):
    """Vectorized deterministic ``hash(key) % mod`` over an Arrow string
    column (pandas C siphash — same kernel as dedup_triples below; a per-row
    Python crc32 here was the #2 profile cost since add_part runs on every
    extracted doc in every plan)."""
    import pandas as pd

    series = pd.Series(col.to_pandas() if hasattr(col, "to_pandas") else col)
    return (
        pd.util.hash_pandas_object(series, index=False).to_numpy() % mod
    ).astype("int32")


def _part_of(key: str, num_partitions: int) -> int:
    """Scalar twin of :func:`_hash_mod_col` — kept consistent so scalar and
    columnar call sites co-partition."""
    import pandas as pd

    return int(
        pd.util.hash_pandas_object(pd.Series([key]), index=False).iloc[0]
        % num_partitions
    )


def _make_add_part(num_partitions: int, n_salts: int | None):
    """Stateless batch fn adding the hash-partition id over (canon_key[, salt])."""
    import pandas as pd

    def add_part(batch: pa.Table) -> pa.Table:
        keys = pd.Series(batch.column("canon_key").to_pandas())
        if n_salts:
            salts = _hash_mod_col(batch.column("doc_id"), n_salts)
            parts = _hash_mod_col(
                keys + "#" + pd.Series(salts).astype(str), num_partitions
            )
            batch = batch.append_column("salt", pa.array(salts, pa.int32()))
        else:
            parts = _hash_mod_col(batch.column("canon_key"), num_partitions)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    return add_part


# shuffle-payload compression: the doc JSON dominates the canonicalize
# exchange (~3.2 KB/doc raw) — the map side PACKS each batch's rows into one
# super-row per destination partition: doc_json texts concatenate and
# compress with ONE zlib call per (batch × part) while the narrow metadata
# columns ride as list columns.  vs the earlier per-row codec this removes
# the row-at-a-time Python zlib loop from the hottest exchange, compresses
# ACROSS docs (repeated JSON keys/URIs amortize: measured ~0.23 vs ~0.38
# per-doc ratio at level 1) and cuts shuffle row count by ~batch_size/P.
# The reducer (_merge_partition) unpacks transparently.
PAYLOAD_COMPRESS_LEVEL = 1

_PACKED_FIXED = [
    ("part", pa.int32()),
    ("packed_blob", pa.binary()),
    ("packed_lens", pa.list_(pa.int32())),
    ("doc_id", pa.list_(pa.string())),
    ("entity_class", pa.list_(pa.string())),
    ("canon_key", pa.list_(pa.string())),
    ("gnd_ids", pa.list_(pa.list_(pa.string()))),
    ("error", pa.list_(pa.string())),
]


def _packed_schema(has_links: bool, has_salt: bool) -> pa.Schema:
    fields = list(_PACKED_FIXED)
    if has_salt:
        fields.append(("salt", pa.list_(pa.int32())))
    if has_links:
        fields.append(("n_links_added", pa.list_(pa.int64())))
    return pa.schema(fields)


def _pack_compress(batch: pa.Table) -> pa.Table:
    """Pack a part-keyed doc batch into one compressed super-row per
    destination partition (see module comment above) — the map side of every
    canonicalize exchange.  Requires the ``part`` column; no-op on batches
    that lack it or are already packed.

    Fully vectorized: one Arrow ``take`` gathers every column into
    part-sorted order, the metadata list columns are built zero-copy from
    the run offsets (``ListArray.from_arrays``), and the doc_json payload is
    sliced per run straight out of the string column's UTF-8 data buffer
    (Arrow string offsets ARE the byte offsets) — no per-row Python gather
    anywhere; only the zlib call itself runs once per (batch × part)."""
    names = batch.schema.names
    if "doc_json" not in names or "part" not in names or "packed_blob" in names:
        return batch
    has_links = "n_links_added" in names
    has_salt = "salt" in names
    schema = _packed_schema(has_links, has_salt)
    if batch.num_rows == 0:
        return schema.empty_table()

    import numpy as np

    parts = batch.column("part").to_numpy(zero_copy_only=False)
    order = np.argsort(parts, kind="stable")
    sorted_tbl = batch.take(pa.array(order, pa.int64()))
    parts_sorted = parts[order]
    n = len(parts_sorted)
    run_starts = np.flatnonzero(np.diff(parts_sorted)) + 1
    offsets = np.concatenate(([0], run_starts, [n])).astype(np.int32)
    part_vals = parts_sorted[offsets[:-1]].astype(np.int32)

    sj = sorted_tbl.column("doc_json")
    if isinstance(sj, pa.ChunkedArray):
        sj = sj.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(sj.type) else np.int32
    str_offs = np.frombuffer(sj.buffers()[1], dtype=off_dtype)[
        sj.offset : sj.offset + len(sj) + 1
    ]
    data = memoryview(sj.buffers()[2])
    row_lens = np.diff(str_offs).astype(np.int32)
    blobs = [
        zlib.compress(
            data[str_offs[a] : str_offs[b]], PAYLOAD_COMPRESS_LEVEL
        )
        for a, b in zip(offsets[:-1], offsets[1:])
    ]

    off_arr = pa.array(offsets, pa.int32())

    def runs(values: pa.Array | pa.ChunkedArray) -> pa.ListArray:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        return pa.ListArray.from_arrays(off_arr, values)

    columns = {
        "part": pa.array(part_vals, pa.int32()),
        "packed_blob": pa.array(blobs, pa.binary()),
        "packed_lens": runs(pa.array(row_lens, pa.int32())),
        "doc_id": runs(sorted_tbl.column("doc_id")),
        "entity_class": runs(sorted_tbl.column("entity_class")),
        "canon_key": runs(sorted_tbl.column("canon_key")),
        "gnd_ids": runs(sorted_tbl.column("gnd_ids")),
        "error": runs(sorted_tbl.column("error")),
    }
    if has_salt:
        columns["salt"] = runs(sorted_tbl.column("salt").cast(pa.int32()))
    if has_links:
        columns["n_links_added"] = runs(
            pc.fill_null(sorted_tbl.column("n_links_added"), 0).cast(pa.int64())
        )
    return pa.Table.from_pydict(columns, schema=schema)


def _unpack_rows(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`_pack_compress` — back to one plain row per doc
    (part/salt columns retained).  No-op on plain batches.

    Metadata columns restore ZERO-COPY via Arrow list-flatten; only the
    doc_json strings are rebuilt (decompress one blob per super-row, slice
    by offsets)."""
    if "packed_blob" not in batch.schema.names:
        return batch
    import numpy as np
    import pyarrow.compute as pc

    has_links = "n_links_added" in batch.schema.names
    has_salt = "salt" in batch.schema.names

    def flat(name: str):
        return pc.list_flatten(batch.column(name))

    lens = pc.list_value_length(batch.column("doc_id")).to_numpy(
        zero_copy_only=False
    )
    part = pa.array(
        np.repeat(batch.column("part").to_numpy(zero_copy_only=False), lens),
        pa.int32(),
    )
    texts: list[str] = []
    blobs = batch.column("packed_blob").to_pylist()
    lens_lists = batch.column("packed_lens").to_pylist()
    for blob, row_lens in zip(blobs, lens_lists):
        raw = zlib.decompress(blob)
        pos = 0
        for length in row_lens:
            texts.append(raw[pos : pos + length].decode())
            pos += length

    arrays = [
        flat("doc_id"),
        flat("entity_class"),
        flat("canon_key"),
        pa.array(texts, pa.string()),
        flat("gnd_ids"),
        flat("error"),
        part,
    ]
    names = [
        "doc_id", "entity_class", "canon_key", "doc_json", "gnd_ids",
        "error", "part",
    ]
    if has_salt:
        arrays.append(flat("salt").cast(pa.int32()))
        names.append("salt")
    if has_links:
        arrays.append(flat("n_links_added").cast(pa.int64()))
        names.append("n_links_added")
    return pa.Table.from_arrays(arrays, names=names)


def _merge_partition(batch: pa.Table) -> pa.Table:
    """One reducer call per hash partition: merge every (canon_key[, salt])
    run inside it.  Plain-Python grouping — no per-group Arrow overhead.

    Also serves as the BATCH-LOCAL combiner of the pre-combine plan (applied
    via plain ``map_batches`` before any shuffle): same associative merge,
    zero-copy pass-through when a batch holds no duplicate keys.

    Accepts either a plain ``doc_json`` batch or a packed one (the reduce
    side of a packed-compressed exchange, see :func:`_pack_compress`);
    always emits plain ``doc_json``."""
    batch = _unpack_rows(batch)
    names = batch.schema.names
    keys = batch.column("canon_key").to_pylist()
    if len(set(keys)) == len(keys):
        # fast path: every key unique — pass through (normalizing the link
        # stage's int32 n_links_added so block schemas stay consistent)
        batch = batch.drop_columns([c for c in ("part", "salt") if c in names])
        if "n_links_added" in batch.schema.names:
            i = batch.schema.get_field_index("n_links_added")
            if batch.schema.field(i).type != pa.int64():
                batch = batch.set_column(
                    i, "n_links_added", batch.column(i).cast(pa.int64())
                )
        return batch
    salts = batch.column("salt").to_pylist() if "salt" in names else None
    doc_ids = batch.column("doc_id").to_pylist()
    doc_jsons = batch.column("doc_json").to_pylist()
    gnd_lists = batch.column("gnd_ids").to_pylist()
    classes = batch.column("entity_class").to_pylist()
    has_links = "n_links_added" in names
    links = batch.column("n_links_added").to_pylist() if has_links else None

    groups: dict = {}
    for i, key in enumerate(keys):
        groups.setdefault((key, salts[i]) if salts else key, []).append(i)

    out = {
        "doc_id": [], "entity_class": [], "canon_key": [],
        "doc_json": [], "gnd_ids": [], "error": [],
    }
    if has_links:
        out["n_links_added"] = []
    for group_key, idxs in groups.items():
        canon = group_key[0] if salts else group_key
        if len(idxs) == 1:
            i = idxs[0]
            rep_id, doc_json, gnd_union = doc_ids[i], doc_jsons[i], list(gnd_lists[i] or [])
            n_links = links[i] if has_links else 0
        else:
            pairs = [(doc_ids[i], json.loads(doc_jsons[i])) for i in idxs]
            rep_id, merged = merge_docs(pairs)
            doc_json = json.dumps(merged, sort_keys=True, ensure_ascii=False)
            gnd_union: list = []
            for i in idxs:
                gnd_union = merge_value(gnd_union, list(gnd_lists[i] or []))
            gnd_union = gnd_union if isinstance(gnd_union, list) else [gnd_union]
            # canonical order — plan-invariant under any merge tree
            gnd_union = sorted(gnd_union)
            n_links = sum(links[i] or 0 for i in idxs) if has_links else 0
        out["doc_id"].append(rep_id)
        out["entity_class"].append(classes[idxs[0]])
        out["canon_key"].append(canon)
        out["doc_json"].append(doc_json)
        out["gnd_ids"].append(gnd_union)
        out["error"].append("")
        if has_links:
            out["n_links_added"].append(int(n_links))

    from esmarc_ray.stages.extract import DOC_SCHEMA

    schema = DOC_SCHEMA
    if has_links:
        schema = schema.append(pa.field("n_links_added", pa.int64()))
    return pa.Table.from_pydict(out, schema=schema)


def _partition_merge(
    docs: ray.data.Dataset, *, num_partitions: int, n_salts: int | None
) -> ray.data.Dataset:
    keyed = docs.map_batches(
        _make_add_part(num_partitions, n_salts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        # pack + compress per destination partition: the all-to-all moves
        # one zlib-compressed super-row per (source batch × part) instead of
        # per-doc payload rows (see _pack_compress)
        _pack_compress,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return keyed.groupby("part").map_groups(_merge_partition, batch_format="pyarrow")


def _split_merge(
    combined: ray.data.Dataset,
    *,
    num_partitions: int,
    has_part: bool,
    dup_key_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Shuffle-only-what-merges plan: a NARROW key-count pass finds the
    canon_keys held by ≥2 docs (post-combine, typically a few % of the
    corpus); docs with a unique key BYPASS the payload shuffle entirely and
    only duplicate-key docs take the hash-partitioned merge.

    Shuffle arithmetic vs the pre-combine plan: the count pass moves one
    (key) string per (batch × local-distinct-key) — ~1-2% of payload bytes —
    and the merge shuffle moves only the duplicate docs' payload (measured
    ~4% of rows on the bench corpus), so total shuffled payload drops ~25×.
    The price is one materialize barrier (the doc payload parks in the
    object store once instead of streaming into the sort).

    The dup-key set is driver-collected and broadcast (``ray.put``) —
    size-gated by ``dup_key_limit``: above it (extreme dup rates / 10^9+
    entities) the plan falls back to the full hash-partitioned merge, which
    needs no driver state."""
    import pandas as pd

    if has_part and "packed_blob" in combined.schema().names:
        # fused-linker input arrives packed (one super-row per part); this
        # plan filters per DOC, so unpack back to plain rows first — the
        # dup-doc exchange below re-packs what actually shuffles
        combined = combined.map_batches(
            _unpack_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    combined = combined.materialize()

    def local_counts(batch: pa.Table) -> "pd.DataFrame":
        vc = pd.Series(batch.column("canon_key").to_pylist()).value_counts()
        df = pd.DataFrame({"canon_key": vc.index, "n": vc.to_numpy()})
        df["__part"] = (
            pd.util.hash_pandas_object(df["canon_key"], index=False) % num_partitions
        ).astype("int32")
        return df

    def dup_only(part: "pd.DataFrame") -> "pd.DataFrame":
        agg = part.groupby("canon_key", as_index=False, sort=False)["n"].sum()
        return agg.loc[agg["n"] >= 2, ["canon_key"]]

    dup_keys = (
        combined.map_batches(local_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dup_only, batch_format="pandas")
        .materialize()
    )
    if dup_keys.count() > dup_key_limit:
        merge_in = combined if has_part else combined.map_batches(
            _make_add_part(num_partitions, None), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return (
            merge_in.map_batches(
                _pack_compress, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("part")
            .map_groups(_merge_partition, batch_format="pyarrow")
        )
    dup_ref = ray.put(frozenset(r["canon_key"] for r in dup_keys.take_all()))

    def split(batch: pa.Table, *, dup_set, keep_dup: bool) -> pa.Table:
        dups = ray.get(dup_set) if isinstance(dup_set, ray.ObjectRef) else dup_set
        mask = pa.array(
            [(k in dups) == keep_dup for k in batch.column("canon_key").to_pylist()],
            pa.bool_(),
        )
        out = batch.filter(mask)
        if not keep_dup:
            drop = [c for c in ("part", "salt") if c in out.schema.names]
            if drop:
                out = out.drop_columns(drop)
        return out

    bypass = combined.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"dup_set": dup_ref, "keep_dup": False},
    )
    if not ray.get(dup_ref):
        return bypass
    dup_docs = combined.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"dup_set": dup_ref, "keep_dup": True},
    )
    if not has_part:
        dup_docs = dup_docs.map_batches(
            _make_add_part(num_partitions, None), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    merged = (
        dup_docs.map_batches(
            # only the dup docs cross the all-to-all — pack + compress them
            _pack_compress, batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("part")
        .map_groups(_merge_partition, batch_format="pyarrow")
    )
    return bypass.union(merged)


@derive_width
def closure_keys(
    docs: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
    max_rounds: int = 8,
) -> ray.data.Dataset:
    """sameAs-closure key rewrite: (canon_key, canon_root) for every key that
    is transitively linked to another through a shared identifier.

    Builds the bipartite key↔identifier graph (one edge per GND id a doc
    carries), runs distributed connected components (ops/graph.py), and maps
    each component to its minimal member canon_key.  Keys with no shared
    identifier never enter the graph and keep their own key (left join in
    :func:`canonicalize`).
    """
    import pandas as pd

    from esmarc_ray.ops.graph import connected_components

    def to_edges(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow list flatten (same list_parent_indices pattern as
        # pipelines/media.py::media_refs) — no per-doc Python loop
        gnds = batch.column("gnd_ids")
        if isinstance(gnds, pa.ChunkedArray):
            gnds = gnds.combine_chunks()
        flat = pc.list_flatten(gnds)
        parents = pc.list_parent_indices(gnds)
        us = pc.take(batch.column("canon_key"), parents)
        vs = pc.binary_join_element_wise("xid:gnd:", pc.cast(flat, pa.string()), "")
        return pa.table({"u": pc.cast(us, pa.string()), "v": vs})

    edges = docs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    comp = connected_components(
        edges, num_partitions=num_partitions, max_rounds=max_rounds
    )
    _keys_schema = pa.schema([("node", pa.string()), ("component", pa.string())])
    _reps_schema = pa.schema([("component", pa.string()), ("canon_root", pa.string())])

    def keep_keys(batch: "pd.DataFrame") -> pa.Table:
        kept = batch[~batch["node"].str.startswith("xid:")]
        return pa.Table.from_pydict(
            {"node": kept["node"].tolist(), "component": kept["component"].tolist()},
            schema=_keys_schema,
        )

    keys_only = comp.map_batches(keep_keys, batch_format="pandas")

    def partial_min(batch: "pd.DataFrame") -> "pd.DataFrame":
        return batch.groupby("component", as_index=False, sort=False)["node"].min()

    def final_min(part: "pd.DataFrame") -> pa.Table:
        # one vectorized min per PARTITION of components (hash-partitioned),
        # not one Ray map_groups dispatch per component
        out = part.groupby("component", as_index=False, sort=False)["node"].min()
        return pa.Table.from_pydict(
            {"component": out["component"].tolist(), "canon_root": out["node"].tolist()},
            schema=_reps_schema,
        )

    from esmarc_ray.ops.relational import partitioned_final

    reps = partitioned_final(
        keys_only.map_batches(partial_min, batch_format="pandas"),
        ["component"],
        final_min,
        num_partitions=num_partitions,
    )

    # keys_only ⋈ reps on component — tag-union-partition join (Dataset.join
    # crashes on hash partitions that receive no left-side blocks in this Ray
    # version, so the repo's own partitioned-join pattern is used instead)
    def tag_keys(batch) -> "pd.DataFrame":
        df = batch.to_pandas() if isinstance(batch, pa.Table) else batch
        return pd.DataFrame(
            {
                "component": df["component"], "payload": df["node"], "side": "k",
                "part": (
                    pd.util.hash_pandas_object(df["component"], index=False)
                    .to_numpy() % num_partitions
                ).astype("int32"),
            }
        )

    def tag_reps(batch) -> "pd.DataFrame":
        df = batch.to_pandas() if isinstance(batch, pa.Table) else batch
        return pd.DataFrame(
            {
                "component": df["component"], "payload": df["canon_root"], "side": "r",
                "part": (
                    pd.util.hash_pandas_object(df["component"], index=False)
                    .to_numpy() % num_partitions
                ).astype("int32"),
            }
        )

    def join_partition(part: "pd.DataFrame") -> "pd.DataFrame":
        keys = part[part["side"] == "k"][["component", "payload"]].rename(
            columns={"payload": "canon_key"}
        )
        rep = part[part["side"] == "r"][["component", "payload"]].rename(
            columns={"payload": "canon_root"}
        )
        if keys.empty or rep.empty:
            return pd.DataFrame(
                {"canon_key": pd.Series(dtype="object"), "canon_root": pd.Series(dtype="object")}
            )
        merged = keys.merge(rep, on="component", how="inner")
        return merged[["canon_key", "canon_root"]]

    tagged = keys_only.map_batches(tag_keys, batch_format="pandas").union(
        reps.map_batches(tag_reps, batch_format="pandas")
    )
    return tagged.groupby("part").map_groups(join_partition, batch_format="pandas")


class _KeyRewriter:
    """Actor-pool stage: rewrite canon_key through the broadcast closure map.

    The map holds only ALIASED keys (canon_root != canon_key), i.e. one entry
    per merged-away entity key — broadcast once via ``ray.put`` and resolved
    once per actor in ``__init__``.  When the alias table outgrows
    ``broadcast_limit`` rows, :func:`_rewrite_keys` switches to the fully
    distributed co-partitioned rewrite instead."""

    def __init__(self, mapping_ref):
        self._map = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mapping = self._map
        keys = batch.column("canon_key").to_pylist()
        rewritten = [mapping.get(k, k) for k in keys]
        return batch.set_column(
            batch.schema.get_field_index("canon_key"),
            "canon_key",
            pa.array(rewritten, pa.string()),
        )


def _rewrite_keys_distributed(
    docs: ray.data.Dataset, mapping: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Fully distributed closure key-rewrite: docs and the (canon_key →
    canon_root) mapping co-hash-partition on canon_key; each partition builds
    its local alias dict and rewrites its doc rows — the alias table never
    touches the driver, so a closure over 10^12 docs streams like any other
    shuffle.  Implemented as the repo's tag-union-partition join (Ray's
    native join reserves actor pools per join; see partitioned_join)."""
    doc_schema = docs.schema().base_schema

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column("canon_root", pa.nulls(n, pa.string()))
        batch = batch.append_column("__side", pa.array(["d"] * n, pa.string()))
        return batch.append_column(
            "part",
            pa.array(_hash_mod_col(batch.column("canon_key"), num_partitions), pa.int32()),
        )

    def tag_map(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols: dict = {}
        for field in doc_schema:
            cols[field.name] = (
                batch.column("canon_key") if field.name == "canon_key" else pa.nulls(n, field.type)
            )
        cols["canon_root"] = batch.column("canon_root")
        cols["__side"] = pa.array(["m"] * n, pa.string())
        cols["part"] = pa.array(
            _hash_mod_col(batch.column("canon_key"), num_partitions), pa.int32()
        )
        return pa.Table.from_pydict(cols)

    def rewrite(part: pa.Table) -> pa.Table:
        sides = part.column("__side").to_pylist()
        keys = part.column("canon_key").to_pylist()
        roots = part.column("canon_root").to_pylist()
        alias = {
            k: r for k, r, s in zip(keys, roots, sides) if s == "m" and r and r != k
        }
        doc_rows = [i for i, s in enumerate(sides) if s == "d"]
        part = part.take(pa.array(doc_rows, pa.int64()))
        rewritten = [alias.get(k, k) for k in (keys[i] for i in doc_rows)]
        part = part.set_column(
            part.schema.get_field_index("canon_key"), "canon_key",
            pa.array(rewritten, pa.string()),
        )
        return part.drop_columns(["canon_root", "__side", "part"])

    tagged = docs.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(mapping.map_batches(tag_map, batch_format="pyarrow"))
    return tagged.groupby("part").map_groups(rewrite, batch_format="pyarrow")


def _rewrite_keys(docs: ray.data.Dataset, mapping: ray.data.Dataset,
                  num_partitions: int, *,
                  broadcast_limit: int = 2_000_000) -> ray.data.Dataset:
    """Replace each doc's canon_key with its closure representative.

    Hybrid plan: the alias table (one row per merged-away entity key) is
    usually tiny, so up to ``broadcast_limit`` rows it broadcasts via
    ``ray.put`` and the rewrite is a shuffle-free actor-pool map; past the
    limit the rewrite runs as a co-partitioned distributed join
    (:func:`_rewrite_keys_distributed`) and nothing materializes driver-side.
    """
    mapping = mapping.materialize()
    if mapping.count() > broadcast_limit:
        return _rewrite_keys_distributed(docs, mapping, num_partitions)
    mapping_df = mapping.to_pandas()
    aliases = mapping_df[mapping_df["canon_key"] != mapping_df["canon_root"]]
    alias_ref = ray.put(dict(zip(aliases["canon_key"], aliases["canon_root"])))
    return docs.map_batches(
        _KeyRewriter,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def estimate_salts(
    docs: ray.data.Dataset,
    *,
    target_parallelism: int = 64,
    sample_rows: int = 100_000,
    max_salts: int = 64,
) -> int:
    """Pick the salt factor from a bounded key-frequency sketch.

    Unsalted, the head ``canon_key``'s group is one reducer task; its share of
    total work should be ≤ 1/P, so salts ≈ ceil(head_share × P).  The sketch
    reads only the key column of the first ``sample_rows`` rows (limit — no
    full scan); head-entity skew is global (ubiquitous GND subjects appear
    everywhere), so a prefix sample sees it.
    """
    import math

    from collections import Counter

    counts: Counter = Counter()
    sampled = 0
    key_col = docs.select_columns(["canon_key"]).limit(sample_rows)
    for batch in key_col.iter_batches(batch_format="pyarrow"):
        keys = batch.column("canon_key").to_pylist()
        counts.update(k for k in keys if k)
        sampled += len(keys)
    if not counts or sampled == 0:
        return 1
    head_share = counts.most_common(1)[0][1] / sampled
    return max(1, min(max_salts, math.ceil(head_share * target_parallelism)))


def canonicalize(
    docs: ray.data.Dataset,
    *,
    n_salts: int | str = 16,
    salted: bool = True,
    precombine: bool | str = False,
    num_partitions: int | None = None,
    closure: bool = False,
) -> ray.data.Dataset:
    """Canonical merge on ``canon_key``; three physical plans, same algebra:

    * ``precombine=True`` (the preferred scale plan): a BATCH-LOCAL combiner
      (``map_batches`` of the same associative merge, zero shuffle) collapses
      each batch's duplicate keys — a head entity at x% corpus frequency
      shrinks by its per-batch occupancy — then ONE hash-partitioned final
      merge.  Halves shuffle bytes vs the salted plan and neutralizes
      head-key stragglers without a frequency sketch.
    * ``precombine="fused"``: the input already ran the combiner + partition
      id INSIDE the linker actor pool (``link_entities(...,
      combine_partitions=N)`` — N must equal ``num_partitions``); only the
      final shuffle + merge runs here.  Saves one full object-store pass of
      the doc payload vs ``precombine=True``.
    * ``salted=True`` (default): two-phase salted partial → final merge,
      two full shuffles.  ``n_salts="auto"`` sizes the salt factor from a
      bounded key-frequency sketch (:func:`estimate_salts`); skew-free
      inputs then skip the partial phase.  An EXPLICIT ``salted=False`` is
      honored — auto never turns salting back on.
    * ``salted=False``: single-shuffle variant (the correctness reference
      for both other plans; fine for small inputs).

    ``closure=True`` first rewrites keys through the sameAs/identifier
    connected components, so entities transitively linked via shared GND ids
    merge even when their direct keys differ (north rule's sameAs closure).

    ``num_partitions=None`` derives the exchange width from the input size /
    cluster (``esmarc_ray.config.derive_partitions``, floored at 256 so the
    flagship merge never narrows below its tuned dev width) — the fused plan
    must receive the SAME explicit N the linker used.
    """
    if num_partitions is None:
        from esmarc_ray.config import dataset_size_hint, derive_partitions

        num_partitions = max(256, derive_partitions(dataset_size_hint(docs)))
    if precombine == "fused":
        if closure:
            raise ValueError("closure requires the un-partitioned doc stream; "
                             "use precombine=True with closure=True")
        return docs.groupby("part").map_groups(
            _merge_partition, batch_format="pyarrow"
        )
    if precombine == "split":
        # dup-key split plan (see _split_merge): unique-key docs bypass the
        # payload shuffle.  Input either fresh (filter+combine here) or the
        # fused linker output (already combined, carries "part").
        if closure:
            raise ValueError("closure requires the un-partitioned doc stream; "
                             "use precombine=True with closure=True")
        has_part = "part" in docs.schema().names
        if has_part:
            combined = docs
        else:
            live = docs.filter(
                expr="entity_class != '_error' and entity_class != '_dropped'"
            )
            combined = live.map_batches(
                _merge_partition, batch_format="pyarrow", zero_copy_batch=True
            )
        return _split_merge(
            combined, num_partitions=num_partitions, has_part=has_part
        )
    live = docs.filter(
        expr="entity_class != '_error' and entity_class != '_dropped'"
    )
    if n_salts == "auto":
        n_salts = estimate_salts(live)
        salted = salted and n_salts > 1
    if closure:
        mapping = closure_keys(live, num_partitions=max(16, num_partitions // 16))
        live = _rewrite_keys(live, mapping, num_partitions=max(16, num_partitions // 16))
    if precombine:
        # batch-local combiner; the payload packing/compression happens
        # inside _partition_merge after partition ids are assigned (Ray
        # fuses the three map stages into one task)
        combined = live.map_batches(
            _merge_partition, batch_format="pyarrow", zero_copy_batch=True
        )
        return _partition_merge(combined, num_partitions=num_partitions, n_salts=None)
    if salted:
        partial = _partition_merge(live, num_partitions=num_partitions, n_salts=n_salts)
        return _partition_merge(partial, num_partitions=num_partitions, n_salts=None)
    return _partition_merge(live, num_partitions=num_partitions, n_salts=None)


@derive_width
def dedup_triples(
    triples: ray.data.Dataset, *, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Exact (subj, pred, obj) dedup — hash-partitioned; deterministic winner
    (smallest doc_id) per key, one reducer call per partition."""
    import pandas as pd

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["subj"] + "\x1f" + batch["pred"] + "\x1f" + batch["obj"]
        # vectorized (pandas C siphash): a per-row crc32 .map here runs a
        # Python loop over every emitted triple — the hottest key count in
        # the engine (~23 triples/doc)
        batch["part"] = (
            pd.util.hash_pandas_object(key, index=False).to_numpy() % num_partitions
        ).astype("int32")
        return batch

    def drop_dups(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.sort_values(["subj", "pred", "obj", "doc_id"])
            .drop_duplicates(["subj", "pred", "obj"])
            .drop(columns=["part"])
        )

    return (
        triples.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(drop_dups, batch_format="pandas")
    )
