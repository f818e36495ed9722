"""Distributed graph operators: connected components over an edge list.

Used for the sameAs closure in canonicalization (north rule: canonical keys
are "GND ID, ISIL, sameAs closure"): entities transitively linked through
shared identifiers must merge even when their direct keys differ.

Algorithm: min-label propagation — every node starts labeled with itself;
each round every node takes the minimum label among itself and its
neighbors, implemented with the repo's hash-partition pattern (tag rows,
union, ``groupby(part)``, pandas merge/min inside the partition — one
reducer call per partition, never per key).  Converged when an
order-insensitive checksum of the (node, label) set stops changing.
Rounds ≈ graph diameter; identifier graphs are near-star-shaped
(diameter ≤ 3-4).  Each round materializes only the two-string-column
label table — payload tables never enter the loop.
"""

from __future__ import annotations

import zlib

import pandas as pd
import ray.data

_EMPTY = {"node": pd.Series(dtype="object"), "label": pd.Series(dtype="object")}


def _part_series(keys: pd.Series, num_partitions: int) -> pd.Series:
    return keys.map(lambda k: zlib.crc32(str(k).encode()) % num_partitions).astype("int32")


def _label_checksum(labels: ray.data.Dataset) -> int:
    """Order-insensitive checksum of (node, label) — XOR of row CRCs."""

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        acc = 0
        for s in batch["node"] + "\x1f" + batch["label"]:
            acc ^= zlib.crc32(s.encode())
        return pd.DataFrame({"crc": [acc]})

    acc = 0
    for row in labels.map_batches(per_batch, batch_format="pandas").take_all():
        acc ^= row["crc"]
    return acc


def _min_by_node(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """(node, label) → one row per node with the min label (hash-partitioned)."""

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.groupby("node", as_index=False, sort=False)["label"].min()
        batch["part"] = _part_series(batch["node"], num_partitions)
        return batch

    def partition_min(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("node", as_index=False, sort=False)["label"].min()

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(partition_min, batch_format="pandas")
    )


def connected_components(
    edges: ray.data.Dataset,
    *,
    u: str = "u",
    v: str = "v",
    num_partitions: int = 16,
    max_rounds: int = 8,
) -> ray.data.Dataset:
    """Connected components of the undirected graph given by ``edges``.

    Returns a Dataset (node, component) where component = min node id (string
    order) of the node's component.  ``max_rounds`` bounds the propagation.

    Partitioning/convergence assumption: propagation moves labels one hop per
    round (each round = two hash-partitioned shuffles of the two-column label
    table), so rounds needed = graph diameter.  The intended workload — the
    sameAs/identifier closure — is a doc↔identifier bipartite graph whose
    components are star-shaped (diameter ≤ ~4); for general graphs with long
    chains raise ``max_rounds`` or switch to star-contraction.
    """

    def to_directed(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch[[u, v]].rename(columns={u: "src", v: "dst"})
        rev = batch[[u, v]].rename(columns={v: "src", u: "dst"})
        out = pd.concat([fwd, rev], ignore_index=True).drop_duplicates()
        out["src"] = out["src"].astype(str)
        out["dst"] = out["dst"].astype(str)
        return out

    directed = edges.map_batches(to_directed, batch_format="pandas").materialize()

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["src"], "label": batch["src"]})

    labels = _min_by_node(
        directed.map_batches(init_labels, batch_format="pandas"), num_partitions
    ).materialize()

    checksum = _label_checksum(labels)
    for _ in range(max_rounds):
        # propagate: every dst receives src's current label.  The join is the
        # tag-union-partition pattern: edge rows keyed by src, label rows keyed
        # by node, co-partitioned by crc32(key) % P, merged per partition.
        def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": batch["src"],
                    "other": batch["dst"],
                    "side": "e",
                    "part": _part_series(batch["src"], num_partitions),
                }
            )

        def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": batch["node"],
                    "other": batch["label"],
                    "side": "l",
                    "part": _part_series(batch["node"], num_partitions),
                }
            )

        def partition_messages(part: pd.DataFrame) -> pd.DataFrame:
            lab = part[part["side"] == "l"][["key", "other"]].rename(
                columns={"other": "label"}
            )
            edge = part[part["side"] == "e"][["key", "other"]]
            if lab.empty or edge.empty:
                return pd.DataFrame(_EMPTY)
            merged = edge.merge(lab, on="key", how="inner")
            return pd.DataFrame({"node": merged["other"], "label": merged["label"]})

        tagged = directed.map_batches(tag_edges, batch_format="pandas").union(
            labels.map_batches(tag_labels, batch_format="pandas")
        )
        msgs = tagged.groupby("part").map_groups(partition_messages, batch_format="pandas")
        new_labels = _min_by_node(labels.union(msgs), num_partitions).materialize()
        new_checksum = _label_checksum(new_labels)
        labels = new_labels
        if new_checksum == checksum:
            break
        checksum = new_checksum

    return labels.map_batches(
        lambda b: b.rename(columns={"label": "component"}), batch_format="pandas"
    )
