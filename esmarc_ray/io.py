"""Dataset sources/sinks.

Physical format: Parquet everywhere in this sandbox (the ``lance`` package is
not installed here); every reader/writer takes ``format="lance"`` and will use
``ray.data.read_lance`` / ``Dataset.write_lance`` when the package is present
— the north rule's Lance tables are a drop-in swap.

Projection pushdown: readers accept ``columns`` so only the needed columns
leave storage (the engine equivalent of the reference's ES ``_source``
includes projection, reference helperfunc.py:21-33).
"""

from __future__ import annotations

from typing import Any

import ray.data

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(
    path: str | list[str],
    *,
    columns: list[str] | None = None,
    doc_ids: "list[str] | None" = None,
    format: str = "parquet",
    **kwargs: Any,
) -> ray.data.Dataset:
    """Read the interleaved span-document table (doc_id, spans).

    ``doc_ids`` restricts the read to the listed ids — the reference's
    ``IDFile`` mode (esmarc/esmarc.py:269-270) — pushed down as a parquet
    row-group/fragment predicate, not a post-read filter.
    """
    if columns is None:
        columns = ["doc_id", "spans"]
    if doc_ids is not None:
        import pyarrow.compute as pc

        kwargs["filter"] = pc.field("doc_id").isin(list(doc_ids))
    if format == "lance" and HAVE_LANCE:
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, *, format: str = "parquet", **kwargs: Any) -> None:
    if format == "lance" and HAVE_LANCE:
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def write_jsonld(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    class_column: str = "entity_class",
    doc_column: str = "doc_json",
    compress: bool = False,
) -> ray.data.Dataset:
    """Reference-format sink: per-entity-class line-delimited JSON-LD.

    Layout matches the reference consumer contract
    (``{prefix}{entity}/{worker}-records.ldj[.gz]``, reference
    esmarc/esmarc.py:311-319) so a downstream of the reference can switch
    without changes — but each Ray block writes its OWN uniquely-named file
    (no append-mode contention, so re-running into a fresh dir is idempotent
    where the reference's append sink duplicates).

    Streams block-by-block; returns the small per-file manifest Dataset
    ``(entity_class, path, n_docs)`` — consume it to drive the write.
    """
    import gzip
    import pathlib
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc

    base = pathlib.Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        out = {"entity_class": [], "path": [], "n_docs": []}
        classes = pc.unique(batch.column(class_column)).to_pylist()
        for cls in classes:
            rows = batch.filter(pc.equal(batch.column(class_column), cls))
            cls_dir = base / str(cls)
            cls_dir.mkdir(parents=True, exist_ok=True)
            name = f"{uuid.uuid4().hex}-records.ldj" + (".gz" if compress else "")
            path = cls_dir / name
            payload = ("\n".join(rows.column(doc_column).to_pylist()) + "\n").encode()
            if compress:
                with gzip.open(path, "wb") as f:
                    f.write(payload)
            else:
                path.write_bytes(payload)
            out["entity_class"].append(str(cls))
            out["path"].append(str(path))
            out["n_docs"].append(rows.num_rows)
        return pa.Table.from_pydict(out)

    return docs.map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True)
