"""End-to-end KG-construction pipeline.

    read spans → extract (stateless map_batches) → entity-link (actor pool)
    → canonicalize (salted groupby) → triples → sorted partitioned write

Resume model (north rule: "resumable from checkpoint with per-partition
lineage"):

* the embarrassingly-parallel half (extract+link) runs per INPUT SHARD —
  a group of input files — each writing an intermediate docs table under
  ``work_dir/docs/shard=K/`` with manifest + _SUCCESS; a rerun skips
  completed shards;
* the wide half (canonicalize → sort → materialize) streams over the
  intermediate docs tables (much smaller than the raw spans) and writes the
  final triple table with its own manifest + marker.

Everything between stages is streaming Dataset execution — no driver-side
materialization of data, only of file lists and manifests.
"""

from __future__ import annotations

import json
import pathlib

import ray
import ray.data

from esmarc_ray.config import DEFAULT_CONFIG, EngineConfig
from esmarc_ray.io import read_documents, write_table
from esmarc_ray.stages.canonicalize import canonicalize
from esmarc_ray.stages.extract import docs_to_triples, extract_docs
from esmarc_ray.stages.link import build_link_indexes, link_entities
from esmarc_ray.stages.materialize import (
    materialize_buckets,
    materialize_shard,
    shard_is_complete,
)


def _input_shards(input_path: str, num_shards: int) -> list[list[str]]:
    files = sorted(str(p) for p in pathlib.Path(input_path).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    num_shards = min(num_shards, len(files))
    return [files[i::num_shards] for i in range(num_shards)]


def run_kg_pipeline(
    input_path: str,
    out_dir: str,
    *,
    config: EngineConfig = DEFAULT_CONFIG,
    link_tables: dict | None = None,
    num_shards: int = 4,
    n_salts: int = 16,
    salted: bool = True,
    precombine: bool = True,
    resume: bool = True,
    link_concurrency: int | tuple[int, int] = (2, 8),
    jsonld: bool = False,
    query: "list | str | None" = None,
    triple_shards: int = 1,
) -> dict:
    """Run (or resume) the full pipeline; returns the run manifest.

    ``query`` is a pushed-down source prefilter (pandas/pyarrow ``filters``
    DNF; see :func:`esmarc_ray.io.compile_query_filter`) — the engine's
    counterpart of the reference CLI's ES query body (reference
    esmarc/cli.py:31-34)."""
    out = pathlib.Path(out_dir)
    docs_dir = out / "docs"
    triples_dir = out / "triples"
    indexes_ref = None
    if link_tables is not None:
        indexes_ref = ray.put(build_link_indexes(link_tables))

    # ---- phase 1: extract + link, per input shard (resumable) --------------
    shards = _input_shards(input_path, num_shards)
    shard_status = []
    for k, files in enumerate(shards):
        shard_dir = docs_dir / f"shard={k:05d}"
        if resume and shard_is_complete(shard_dir):
            shard_status.append({"shard": k, "status": "skipped(resume)"})
            continue
        docs = extract_docs(read_documents(files, query=query), config)
        if indexes_ref is not None:
            docs = link_entities(docs, indexes_ref, concurrency=link_concurrency)
        shard_dir.mkdir(parents=True, exist_ok=True)
        write_table(docs, str(shard_dir))
        manifest = {"inputs": files, "row_count": -1}  # -1: counted lazily downstream
        (shard_dir / "_manifest.json").write_text(json.dumps(manifest, indent=1))
        (shard_dir / "_SUCCESS").write_text(json.dumps({"rows": -1}))
        shard_status.append({"shard": k, "status": "built"})

    # ---- phase 2: canonicalize + materialize (wide, streaming) -------------
    doc_files = sorted(str(p) for p in docs_dir.glob("shard=*/*.parquet"))
    docs_ds = ray.data.read_parquet(doc_files)
    canonical = canonicalize(
        docs_ds, n_salts=n_salts, salted=salted, precombine=precombine
    )
    jsonld_summary = None
    if jsonld:
        # two consumers of the canonical stream (LDJ sink + triples) — park
        # it in a parquet checkpoint so the wide phase runs once, not twice
        canon_dir = out / "canonical"
        if canon_dir.exists():
            import shutil

            shutil.rmtree(canon_dir)
        canonical.write_parquet(str(canon_dir))
        canonical = ray.data.read_parquet(str(canon_dir))

        from esmarc_ray.io import write_jsonld

        # write_parquet/write_jsonld file names are unique per run — wipe the
        # sink dir (like canonical/ and the triple shards) or a resumed run
        # would accumulate a second copy of every .ldj stream
        jsonld_dir = out / "jsonld"
        if jsonld_dir.exists():
            import shutil

            shutil.rmtree(jsonld_dir)
        files_manifest = write_jsonld(canonical, str(jsonld_dir)).to_pandas()
        jsonld_summary = {
            "n_files": int(len(files_manifest)),
            "n_docs": int(files_manifest["n_docs"].sum()),
            "classes": sorted(files_manifest["entity_class"].unique().tolist()),
        }
    triples = docs_to_triples(canonical)
    if triple_shards > 1:
        # 100-TB wide-phase shape: per-bucket lineage + resumability — a
        # resumed run drops completed buckets BEFORE the sort and rebuilds
        # only the missing ones (see materialize_buckets)
        manifest = materialize_buckets(
            triples, triples_dir, num_buckets=triple_shards,
            inputs=doc_files, sort=True, resume=resume,
        )
    else:
        manifest = materialize_shard(
            triples, triples_dir / "shard=00000", inputs=doc_files, sort=True
        )

    run_manifest = {
        "input_path": input_path,
        "num_shards": len(shards),
        "shards": shard_status,
        "triples": manifest,
    }
    if jsonld_summary is not None:
        run_manifest["jsonld"] = jsonld_summary
    (out / "_run_manifest.json").write_text(json.dumps(run_manifest, indent=1, sort_keys=True))
    return run_manifest
