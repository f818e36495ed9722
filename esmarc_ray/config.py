"""Engine configuration.

The reference threads ``base_id`` / ``target_id`` through process-wide
module globals (reference: esmarc/globals.py:1-5, set in esmarc/esmarc.py:255-257).
Process globals break actor reuse, so here the same knobs travel in a frozen
dataclass that batch functions and actor constructors capture by value.

Wall-clock dependence in the reference (esmarc/dates.py:114,170,249 uses
``datetime.today()``) is pinned via ``today_year`` so output is deterministic
and reruns are reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # URI prefix that source record ids may carry and that gets stripped
    # before minting target URIs (reference default: esmarc/esmarc.py:250).
    base_id: str = "http://swb.bsz-bw.de/DB=2.1/PPNSET?PPN="
    # URI prefix for all minted entity URIs (reference default: esmarc/esmarc.py:251).
    target_id: str = "https://data.slub-dresden.de/"
    # Name of the source index recorded in isBasedOn (reference: processing.py:53-55).
    source_index: str = "kxp-de14"
    # Pinned "current year" for the not-in-the-future date guard and the
    # two-digit century pivot (reference: dates.py:114,249).
    today_year: int = 2026
    # Pinned two-digit pivot for handle_dateCreated (reference: dates.py:249).
    today_yy: int = 26


DEFAULT_CONFIG = EngineConfig()


# -- shared shuffle-width knob ----------------------------------------------
#
# Every hash exchange in the engine (partitioned_final / partial_groupby_agg /
# joins / canonicalize / LSH bucketing) sizes its partition count through this
# one function instead of a frozen literal, so shuffle width scales with the
# deployment instead of being pinned to the dev box:
#
#   1. explicit caller value wins (ops whose OUTPUT embeds the partition id
#      — pack_sequences, canopy_clusters, TransE — keep pinned defaults so
#      results don't vary with cluster size),
#   2. else ESMARC_NUM_PARTITIONS env var (cluster-wide operator knob),
#   3. else a byte-derived count when the caller has a cheap size hint
#      (~TARGET_PARTITION_BYTES per partition),
#   4. else 2 × cluster CPUs — on a 256-node × 32-core cluster that is
#      16384-way, not 64-way.

TARGET_PARTITION_BYTES = 128 << 20
_PARTITIONS_FLOOR = 8
_PARTITIONS_CEIL = 65536


def derive_partitions(
    size_bytes: int | None = None,
    *,
    target_bytes: int = TARGET_PARTITION_BYTES,
    lo: int = _PARTITIONS_FLOOR,
    hi: int = _PARTITIONS_CEIL,
) -> int:
    import math
    import os

    env = os.environ.get("ESMARC_NUM_PARTITIONS")
    if env:
        return max(1, int(env))
    if size_bytes:
        return max(lo, min(hi, math.ceil(size_bytes / target_bytes)))
    cpus = 0
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(lo, min(hi, 2 * cpus if cpus else 64))


def dataset_size_hint(ds) -> int | None:
    """``ds.size_bytes()`` ONLY when it is metadata-cheap — a materialized
    dataset or an untransformed read (parquet footer estimate).  A lazy
    transformed dataset would EXECUTE to answer, so return None instead and
    let :func:`derive_partitions` fall back to the cluster-CPU heuristic."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds.size_bytes()
        dag = ds._plan._logical_plan.dag
        if type(dag).__name__ in ("Read", "InputData", "FromArrow", "FromPandas"):
            return ds.size_bytes()
    except Exception:
        pass
    return None


def derive_width(fn):
    """Decorator for partitioned operators: resolve ``num_partitions=None``
    (now the default on every such op) through :func:`derive_partitions` at
    call time, so the shared shuffle-width ladder (explicit caller value →
    ``ESMARC_NUM_PARTITIONS`` → byte-derived when the first Dataset
    argument has a metadata-cheap size → 2 × cluster CPUs) governs every
    exchange unless a caller pins a width deliberately.  Only applied to
    ops whose OUTPUT is partition-invariant — partition-id-emitting ops
    (pack_sequences, canopy_clusters, TransE) keep pinned defaults."""
    import functools
    import inspect

    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs)
        if bound.arguments.get("num_partitions") is None:
            hint = None
            for val in bound.arguments.values():
                if hasattr(val, "map_batches"):  # first Dataset argument
                    hint = dataset_size_hint(val)
                    break
            bound.arguments["num_partitions"] = derive_partitions(hint)
        return fn(*bound.args, **bound.kwargs)

    return wrapper
