"""Graph materialize: sorted, partitioned, resumable triple-table sink.

Contrast with the reference's sink (append-mode per-worker .ldj files that
DUPLICATE output on rerun, reference esmarc/esmarc.py:311-319): here every
shard writes to its own directory with a lineage manifest and an atomic
``_SUCCESS`` checkpoint marker; a resumed run skips shards whose marker
validates, so resumed output == clean-run output (tested).

Layout::

    out_dir/
      shard=00000/
        entity_class=resources/ *.parquet   (partitioned, sorted within shard)
        ...
        _manifest.json    {inputs, row counts per class, content hash}
        _SUCCESS          (written last — the checkpoint marker)
      _run_manifest.json  (driver-side: shard list + per-shard status)
"""

from __future__ import annotations

import json
import pathlib
import shutil
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from esmarc_ray.io import write_table


def materialize_shard(
    triples: ray.data.Dataset,
    shard_dir: str | pathlib.Path,
    *,
    inputs: list[str] | None = None,
    sort: bool = True,
    format: str = "parquet",
) -> dict:
    """Sort + partition-write one shard's triples; manifest then marker.

    An existing (necessarily incomplete or stale) shard dir is wiped first —
    the write is idempotent, never appending like the reference sink does.
    """
    import time

    shard_path = pathlib.Path(shard_dir)
    if shard_path.exists():
        shutil.rmtree(shard_path)
    shard_path.mkdir(parents=True, exist_ok=True)
    t_start = time.perf_counter()
    if sort:
        triples = triples.sort(["entity_class", "subj", "pred"])
    write_table(
        triples,
        str(shard_path),
        format=format,
        partition_cols=["entity_class"],
    )
    write_seconds = time.perf_counter() - t_start

    # lineage manifest: per-class row counts + an order-insensitive content hash
    counts: dict[str, int] = {}
    content_hash = 0
    n_rows = 0
    for batch in ray.data.read_parquet(str(shard_path)).iter_batches(batch_format="pyarrow"):
        n_rows += batch.num_rows
        for cls, cnt in zip(*_class_counts(batch)):
            counts[cls] = counts.get(cls, 0) + cnt
        for subj, pred, obj in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
        ):
            content_hash ^= zlib.crc32(f"{subj}\x1f{pred}\x1f{obj}".encode())
    manifest = {
        "inputs": inputs or [],
        "row_count": n_rows,
        "rows_per_class": counts,
        "content_hash": content_hash,
        # per-partition metrics (north rule: lineage + metrics per shard)
        "metrics": {
            "write_seconds": round(write_seconds, 3),
            "bytes_written": sum(
                f.stat().st_size for f in shard_path.rglob("*.parquet")
            ),
            "n_files": sum(1 for _ in shard_path.rglob("*.parquet")),
        },
    }
    (shard_path / "_manifest.json").write_text(json.dumps(manifest, indent=1, sort_keys=True))
    (shard_path / "_SUCCESS").write_text(json.dumps({"rows": n_rows}))
    return manifest


def _class_counts(batch: pa.Table):
    grouped = batch.group_by("entity_class").aggregate([("entity_class", "count")])
    return (
        grouped.column("entity_class").to_pylist(),
        grouped.column("entity_class_count").to_pylist(),
    )


def shard_is_complete(shard_dir: str | pathlib.Path) -> bool:
    shard_path = pathlib.Path(shard_dir)
    if not (shard_path / "_SUCCESS").exists() or not (shard_path / "_manifest.json").exists():
        return False
    try:
        manifest = json.loads((shard_path / "_manifest.json").read_text())
        marker = json.loads((shard_path / "_SUCCESS").read_text())
        return manifest["row_count"] == marker["rows"]
    except (ValueError, KeyError):
        return False
