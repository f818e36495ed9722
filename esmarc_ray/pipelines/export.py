"""Training-shard export: deterministic shuffle → partitioned shard write.

The last stage of a pretraining-data pipeline: spread the curated corpus
across N shards in a pseudorandom but fully deterministic order so that (a)
any worker can rebuild exactly its shard from the source (resumable — a
failed run re-writes only missing shards), and (b) consecutive docs in a
shard are unrelated (the "global shuffle" training wants) without a
``random_shuffle`` all-to-all over the payload.

Mechanism: ``shard = md5(seed:doc_id)[:8] % n_shards`` and the within-shard
order is the full md5 digest — both pure functions of (seed, doc_id), so the
assignment is SQL-expressible and the driver's DuckDB oracle can hash-check
it end-to-end (``shard_assignment`` / ``shard_sizes`` queries).

Scale notes: assignment is map-only (no shuffle); the write is ONE
hash-partitioned exchange on ``shard`` (the same partitioned-write shape as
the triple sink).  At 10^12 docs, raise ``n_shards`` so a shard fits a
worker (shards are the resume/parallelism unit downstream).
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import shutil

import pandas as pd
import ray.data


def assign_shards(
    docs: ray.data.Dataset,
    *,
    n_shards: int,
    seed: int = 42,
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Append ``shard`` (int) and ``sort_key`` (hex md5) columns — the
    deterministic shuffle assignment; map-only."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        digests = [
            hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
            for v in batch[id_column]
        ]
        batch = batch.copy()
        batch["sort_key"] = digests
        batch["shard"] = pd.Series(
            [int(d[:8], 16) % n_shards for d in digests], index=batch.index
        ).astype("int64")
        return batch

    return docs.map_batches(assign, batch_format="pandas")


def export_training_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    n_shards: int,
    seed: int = 42,
    id_column: str = "doc_id",
    resume: bool = False,
) -> pd.DataFrame:
    """Write ``{out}/shard={k}/*.parquet`` (pseudorandom within-shard order)
    plus a ``_manifest.json`` per shard; returns the manifest table
    ``(shard, n_docs)``.

    ``resume=False`` (default): an existing out_dir is wiped and every shard
    rewritten.  ``resume=True``: shards whose ``_manifest.json`` already
    exists are SKIPPED — the checkpoint/restart semantics of the triple sink
    (a killed export run re-does only unfinished shards; the manifest is
    written after the parquet, so a torn shard has no manifest and is
    redone).  The returned table covers every shard either way, finished
    shards read back from their manifests."""
    base = pathlib.Path(out_dir)
    done: dict[int, int] = {}
    if base.exists() and not resume:
        shutil.rmtree(base)
    elif base.exists():
        for mf in base.glob("shard=*/_manifest.json"):
            meta = json.loads(mf.read_text())
            if meta.get("seed") == seed:
                done[int(meta["shard"])] = int(meta["n_docs"])
            else:  # stale checkpoint from a different shuffle seed: redo
                shutil.rmtree(mf.parent)
    assigned = assign_shards(
        docs, n_shards=n_shards, seed=seed, id_column=id_column
    )
    if done:
        finished = sorted(done)
        assigned = assigned.filter(expr=f"shard not in {finished}")
    # ONE keyed exchange: group rows by shard and write each shard dir in
    # its reducer (sorted by sort_key = the deterministic shuffle order)
    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["shard"].iloc[0])
        shard_dir = base / f"shard={shard}"
        shard_dir.mkdir(parents=True, exist_ok=True)
        group = group.sort_values("sort_key").drop(columns=["shard"])
        group.to_parquet(shard_dir / "part-0.parquet", index=False)
        (shard_dir / "_manifest.json").write_text(
            json.dumps({"shard": shard, "n_docs": len(group), "seed": seed})
        )
        return pd.DataFrame({"shard": [shard], "n_docs": [len(group)]})

    written = assigned.groupby("shard").map_groups(
        write_shard, batch_format="pandas"
    ).to_pandas()
    if done:  # fold finished shards back in from their manifests
        prior = pd.DataFrame(
            {"shard": list(done.keys()), "n_docs": list(done.values())}
        )
        written = (
            pd.concat([written, prior], ignore_index=True)
            if len(written)
            else prior
        )
    return (
        written.astype({"shard": "int64", "n_docs": "int64"})
        .sort_values("shard")
        .reset_index(drop=True)
    )
