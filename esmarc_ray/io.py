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
