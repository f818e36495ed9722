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

    # Lineage manifest: per-class row counts + an order-insensitive content
    # hash.  Computed as distributed per-block partials (count, class counts,
    # xor-crc) folded driver-side — the driver touches only ~one small row per
    # block, never the triples themselves, so the manifest pass scales with
    # the write instead of becoming a single-threaded re-read of the shard.
    counts: dict[str, int] = {}
    content_hash = 0
    n_rows = 0
    partials = ray.data.read_parquet(str(shard_path)).map_batches(
        _manifest_partial, batch_format="pyarrow"
    )
    for part in partials.take_all():
        n_rows += part["n_rows"]
        content_hash ^= part["xor_crc"]
        for cls, cnt in json.loads(part["class_counts"]).items():
            counts[cls] = counts.get(cls, 0) + cnt
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


def _write_manifest(
    shard_path: pathlib.Path, inputs: list[str] | None, write_seconds: float
) -> dict:
    """Distributed lineage-manifest pass + marker for one written dir:
    per-block (count, class-count, xor-crc) partials folded driver-side —
    the driver touches one small row per block, never the triples."""
    counts: dict[str, int] = {}
    content_hash = 0
    n_rows = 0
    if any(shard_path.rglob("*.parquet")):
        partials = ray.data.read_parquet(str(shard_path)).map_batches(
            _manifest_partial, batch_format="pyarrow"
        )
        for part in partials.take_all():
            n_rows += part["n_rows"]
            content_hash ^= part["xor_crc"]
            for cls, cnt in json.loads(part["class_counts"]).items():
                counts[cls] = counts.get(cls, 0) + cnt
    manifest = {
        "inputs": inputs or [],
        "row_count": n_rows,
        "rows_per_class": counts,
        "content_hash": content_hash,
        "metrics": {
            "write_seconds": round(write_seconds, 3),
            "bytes_written": sum(
                f.stat().st_size for f in shard_path.rglob("*.parquet")
            ),
            "n_files": sum(1 for _ in shard_path.rglob("*.parquet")),
        },
    }
    (shard_path / "_manifest.json").write_text(
        json.dumps(manifest, indent=1, sort_keys=True)
    )
    (shard_path / "_SUCCESS").write_text(json.dumps({"rows": n_rows}))
    return manifest


def materialize_buckets(
    triples: ray.data.Dataset,
    out_dir: str | pathlib.Path,
    *,
    num_buckets: int = 16,
    inputs: list[str] | None = None,
    sort: bool = True,
    resume: bool = True,
) -> dict:
    """Bucketed, PER-BUCKET-resumable production sink — the wide phase's
    100-TB shape: output splits into ``num_buckets`` hash(subj) ranges,
    each written sorted with its OWN lineage manifest + ``_SUCCESS``
    marker, all in ONE pass (a single global sort on (bucket,
    entity_class, subj, pred) then a hive write partitioned by
    (bucket, entity_class)).

    A resumed run drops completed buckets' rows BEFORE the sort, so the
    expensive half of the wide phase (range exchange + write) scales with
    the MISSING buckets only, and rebuilds exactly those; per-bucket
    manifests make resumed output == clean output (gated by
    tests/test_pipeline.py::test_bucketed_materialize_resume and the
    ``triple_bucket_resume`` oracle).  Bucket assignment is the engine's
    standard deterministic hash, so reruns route rows identically.
    """
    import time

    import pandas as pd

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def bdir(k: int) -> pathlib.Path:
        return out / f"bucket={k}"

    done = [
        k for k in range(num_buckets) if resume and shard_is_complete(bdir(k))
    ]
    todo = sorted(set(range(num_buckets)) - set(done))
    status = {
        "num_buckets": num_buckets,
        "skipped": done,
        "built": todo,
        "buckets": {},
    }
    for k in done:
        status["buckets"][str(k)] = json.loads(
            (bdir(k) / "_manifest.json").read_text()
        )
    if not todo:
        return status

    def add_bucket(batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pandas().astype(str)
        b = (
            pd.util.hash_pandas_object(subj, index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    keyed = triples.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    if done:
        done_arr = pa.array(done, pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column("bucket"), value_set=done_arr))
            return batch.filter(mask)

        keyed = keyed.map_batches(
            drop_done, batch_format="pyarrow", zero_copy_batch=True
        )
    for k in todo:
        shutil.rmtree(bdir(k), ignore_errors=True)
    t0 = time.perf_counter()
    if sort:
        keyed = keyed.sort(["bucket", "entity_class", "subj", "pred"])
    write_table(keyed, str(out), partition_cols=["bucket", "entity_class"])
    write_seconds = time.perf_counter() - t0
    for k in todo:
        bdir(k).mkdir(parents=True, exist_ok=True)  # empty bucket is valid
        status["buckets"][str(k)] = _write_manifest(
            bdir(k), inputs, write_seconds
        )
    return status


def _class_counts(batch: pa.Table):
    grouped = batch.group_by("entity_class").aggregate([("entity_class", "count")])
    return (
        grouped.column("entity_class").to_pylist(),
        grouped.column("entity_class_count").to_pylist(),
    )


def _manifest_partial(batch: pa.Table) -> pa.Table:
    """One-row (n_rows, class_counts, xor_crc) partial per block.

    The xor-crc matches the historical driver-side definition exactly
    (crc32 over ``subj\\x1fpred\\x1fobj``, xor-folded — order-insensitive),
    so manifests stay byte-identical across the distributed rewrite.  The
    row join is vectorized in Arrow; only the crc itself loops, over the
    block's pre-joined bytes.
    """
    joined = pc.binary_join_element_wise(
        pc.fill_null(pc.cast(batch.column("subj"), pa.string()), "None"),
        pc.fill_null(pc.cast(batch.column("pred"), pa.string()), "None"),
        pc.fill_null(pc.cast(batch.column("obj"), pa.string()), "None"),
        "\x1f",
    )
    xor_crc = 0
    for buf in joined.cast(pa.binary()).to_pylist():
        xor_crc ^= zlib.crc32(buf)
    classes, cnts = _class_counts(batch)
    return pa.table(
        {
            "n_rows": [batch.num_rows],
            "class_counts": [json.dumps(dict(zip(classes, cnts)))],
            "xor_crc": pa.array([xor_crc], type=pa.uint64()),
        }
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
