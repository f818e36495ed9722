"""Similarity search over an embedding column (list<float>).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is tiny and
  broadcast (closure-captured once per worker); each batch does one numpy
  matmul and keeps its local top-k, the driver merges per-batch tops (k ×
  n_batches rows, not the dataset).
* :func:`IvfIndex` — the scale path: k-means coarse quantizer trained on a
  sample, assignments batch-local, searches probe only the ``n_probe``
  nearest cells.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray.data

from esmarc_ray.config import derive_width



def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-9, None)


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k per query row; returns (query_id, vec_id, score)."""
    q = _normalize(np.asarray(queries, dtype=np.float32))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(np.stack(batch[vector_column].to_numpy()).astype(np.float32))
        scores = mat @ q.T  # (batch, n_queries)
        n = min(k, scores.shape[0])
        idx = np.argpartition(-scores, n - 1, axis=0)[:n]  # (n, n_queries)
        out = {"query_id": [], id_column: [], "score": []}
        ids = batch[id_column].to_numpy()
        for qi in range(q.shape[0]):
            for row in idx[:, qi]:
                out["query_id"].append(qi)
                out[id_column].append(ids[row])
                out["score"].append(float(scores[row, qi]))
        return pd.DataFrame(out)

    partials = embeddings.map_batches(local_topk, batch_format="pandas")
    best: dict[int, list] = {}
    for batch in partials.iter_batches(batch_format="pandas"):
        for qi, vid, score in zip(batch["query_id"], batch[id_column], batch["score"]):
            heap = best.setdefault(int(qi), [])
            item = (float(score), int(vid))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows = []
    for qi, heap in sorted(best.items()):
        for score, vid in sorted(heap, reverse=True):
            rows.append({"query_id": qi, id_column: vid, "score": score})
    return pd.DataFrame(rows)


def knn_graph(
    embeddings: ray.data.Dataset,
    k: int = 5,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    chunk_rows: int = 65536,
) -> ray.data.Dataset:
    """Exact all-pairs cosine k-nearest-neighbor graph via blocked matmul.

    The reference matrix is staged into the OBJECT STORE as normalized row
    chunks (one ``ray.put`` per chunk; the driver holds one chunk at a time
    while staging).  Workers ``ray.get`` the chunks lazily — plasma maps the
    same buffer zero-copy into every task on a node, so the physical cost is
    one copy per NODE, not per task.  Each query batch streams over the
    chunks keeping a running exact top-k (peak heap O(batch × chunk)), so
    every emitted row is already the GLOBAL top-k: no shuffle, no driver
    merge, and the output streams straight to the consumer.

    Requires the reference matrix to fit in the cluster object store (n·d·8
    bytes spread over nodes).  Past that, restrict candidates per IVF cell
    (:class:`IvfIndex`) and build the graph cell-by-cell.

    Returns a Dataset of (id_column, neighbor_id, rank) — rank 1 = nearest,
    ties broken by ascending neighbor id; self-pairs excluded.
    """
    chunk_refs: list = []
    ids_buf: list[np.ndarray] = []
    vec_buf: list[np.ndarray] = []
    buffered = 0

    def flush() -> None:
        nonlocal ids_buf, vec_buf, buffered
        if not buffered:
            return
        ids = np.concatenate(ids_buf)
        mat = _normalize(np.vstack(vec_buf).astype(np.float32))
        chunk_refs.append(ray.put((ids, mat)))
        ids_buf, vec_buf, buffered = [], [], 0

    for batch in embeddings.select_columns([id_column, vector_column]).iter_batches(
        batch_format="pandas"
    ):
        ids_buf.append(batch[id_column].to_numpy().astype(np.int64))
        vec_buf.append(np.stack(batch[vector_column].to_numpy()).astype(np.float32))
        buffered += len(batch)
        if buffered >= chunk_rows:
            flush()
    flush()

    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids = batch[id_column].to_numpy().astype(np.int64)
        q = _normalize(np.stack(batch[vector_column].to_numpy()).astype(np.float32))
        nq = len(qids)
        best_s = np.full((nq, k), -np.inf, dtype=np.float32)
        best_i = np.full((nq, k), -1, dtype=np.int64)
        rows = np.arange(nq)[:, None]
        for ref in chunk_refs:
            cids, cmat = ray.get(ref)
            sims = q @ cmat.T  # (nq, chunk)
            sims[qids[:, None] == cids[None, :]] = -np.inf  # exclude self
            cand_s = np.concatenate([best_s, sims], axis=1)
            cand_i = np.concatenate(
                [best_i, np.broadcast_to(cids, sims.shape)], axis=1
            )
            sel = np.argpartition(-cand_s, k - 1, axis=1)[:, :k]
            best_s, best_i = cand_s[rows, sel], cand_i[rows, sel]
        order = np.lexsort((best_i, -best_s), axis=-1)  # score desc, id asc
        best_s, best_i = best_s[rows, order], best_i[rows, order]
        keep = best_i.ravel() >= 0  # drop padding when n-1 < k
        return pd.DataFrame(
            {
                id_column: np.repeat(qids, k)[keep],
                "neighbor_id": best_i.ravel()[keep],
                "rank": np.tile(np.arange(1, k + 1, dtype=np.int64), nq)[keep],
            }
        )

    return embeddings.map_batches(batch_topk, batch_format="pandas")


class IvfIndex:
    """IVF(flat) coarse index: spherical k-means cells, probe-limited search.

    Scale shape (the 100-TB design, replacing the round-1/2 driver-sample
    index):

    * **train** — seeds from a small bounded sample (``sample_limit`` rows,
      the only driver materialization, centroid-count sized), then refines
      with DISTRIBUTED Lloyd passes: each pass is one ``map_batches`` over
      the full dataset emitting per-cell (count, vector-sum) partials —
      k·(d+1) floats per batch — folded on the driver.  The driver holds
      only the k×d centroid matrix, never the vectors.
    * **write_index / load / search_index** — the sharded on-disk form: the
      assigned table is written PARTITIONED BY cell (hive layout) next to a
      ``centroids.json``; a probe reads only the ``cell=<c>`` directories the
      query's ``n_probe`` nearest centroids name — partition pruning at the
      read, so a search touches n_probe/n_cells of the corpus regardless of
      total size, and each shard's exact re-rank runs as a broadcast-queries
      ``map_batches`` stage.
    * **search** — in-memory variant over an ``assign``-ed Dataset; same
      broadcast-queries re-rank, probe narrowed by a cell filter.
    """

    def __init__(self, n_cells: int = 16, n_iter: int = 8, seed: int = 5):
        self.n_cells = n_cells
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, embeddings: ray.data.Dataset, *, sample_limit: int = 20000,
              vector_column: str = "embedding", refine_iters: int | None = None) -> "IvfIndex":
        seed_rows = embeddings.limit(sample_limit).take_all()
        sample = _normalize(np.stack([r[vector_column] for r in seed_rows]).astype(np.float32))
        rng = np.random.RandomState(self.seed)
        centroids = sample[rng.choice(len(sample), self.n_cells, replace=False)]
        for _ in range(self.n_iter):  # local Lloyd warm-up on the seed sample
            assign = (sample @ centroids.T).argmax(axis=1)
            for c in range(self.n_cells):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)

        # distributed refinement over the FULL dataset: per-batch per-cell
        # moment partials, driver folds k rows per batch — no vector ever
        # reaches the driver
        n_refine = self.n_iter if refine_iters is None else refine_iters
        k = self.n_cells
        for _ in range(n_refine):
            cents = centroids

            def moment_partial(batch: pd.DataFrame) -> pd.DataFrame:
                mat = _normalize(
                    np.stack(batch[vector_column].to_numpy()).astype(np.float32)
                )
                assign = (mat @ cents.T).argmax(axis=1)
                counts = np.bincount(assign, minlength=k).astype("float64")
                sums = np.zeros((k, cents.shape[1]))
                np.add.at(sums, assign, mat.astype(np.float64))
                return pd.DataFrame(
                    {"cid": np.arange(k, dtype="int64"), "n": counts, "vsum": list(sums)}
                )

            parts = embeddings.map_batches(
                moment_partial, batch_format="pandas"
            ).to_pandas()
            counts = parts.groupby("cid")["n"].sum().to_numpy()
            new = centroids.astype(np.float64).copy()
            for cid, grp in parts.groupby("cid"):
                if counts[cid] > 0:
                    new[cid] = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0) / counts[cid]
            centroids = _normalize(new).astype(np.float32)
        self.centroids = centroids
        return self

    def assign(self, embeddings: ray.data.Dataset, *, id_column: str = "vec_id",
               vector_column: str = "embedding") -> ray.data.Dataset:
        centroids = self.centroids

        def add_cell(batch: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(batch[vector_column].to_numpy()).astype(np.float32))
            batch["cell"] = (mat @ centroids.T).argmax(axis=1).astype("int32")
            return batch

        return embeddings.map_batches(add_cell, batch_format="pandas")

    def _probe_cells(self, queries: np.ndarray, n_probe: int) -> list[int]:
        q = _normalize(np.asarray(queries, dtype=np.float32))
        cells = np.argsort(-(q @ self.centroids.T), axis=1)[:, :n_probe]
        return sorted({int(c) for row in cells for c in row})

    def search(self, assigned: ray.data.Dataset, queries: np.ndarray, k: int = 10,
               n_probe: int = 4, *, id_column: str = "vec_id",
               vector_column: str = "embedding") -> pd.DataFrame:
        """Probe the n_probe closest cells per query; exact cosine inside."""
        q = _normalize(np.asarray(queries, dtype=np.float32))
        wanted = self._probe_cells(q, n_probe)
        subset = assigned.filter(expr=f"cell in {list(wanted)}")
        return brute_force_topk(subset, q, k, id_column=id_column, vector_column=vector_column)

    # ------------------------------------------------------------------ #
    # sharded on-disk index                                               #
    # ------------------------------------------------------------------ #

    def write_index(self, embeddings: ray.data.Dataset, path: str, *,
                    id_column: str = "vec_id",
                    vector_column: str = "embedding") -> str:
        """Materialize the sharded index: hive-partitioned by cell + centroids."""
        import json
        import pathlib

        root = pathlib.Path(path)
        root.mkdir(parents=True, exist_ok=True)
        self.assign(
            embeddings, id_column=id_column, vector_column=vector_column
        ).write_parquet(str(root / "vectors"), partition_cols=["cell"])
        (root / "centroids.json").write_text(
            json.dumps({"n_cells": self.n_cells,
                        "centroids": self.centroids.tolist()})
        )
        return str(root)

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        import json
        import pathlib

        meta = json.loads((pathlib.Path(path) / "centroids.json").read_text())
        index = cls(n_cells=meta["n_cells"])
        index.centroids = np.asarray(meta["centroids"], dtype=np.float32)
        return index

    def search_index(self, path: str, queries: np.ndarray, k: int = 10,
                     n_probe: int = 4, *, id_column: str = "vec_id",
                     vector_column: str = "embedding") -> pd.DataFrame:
        """Partition-pruned probe: read ONLY the probed ``cell=<c>`` shards."""
        import pathlib

        q = _normalize(np.asarray(queries, dtype=np.float32))
        wanted = self._probe_cells(q, n_probe)
        root = pathlib.Path(path) / "vectors"
        # a path LIST is treated as files by the reader — expand each probed
        # cell dir to its parquet files
        shard_files = [
            str(f)
            for c in wanted
            for f in sorted((root / f"cell={c}").glob("*.parquet"))
            if (root / f"cell={c}").exists()
        ]
        subset = ray.data.read_parquet(shard_files)
        return brute_force_topk(subset, q, k, id_column=id_column,
                                vector_column=vector_column)


def embedding_dim_stats(
    embeddings: ray.data.Dataset,
    *,
    vector_column: str = "embedding",
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Per-dimension mean / population stddev over an embedding column —
    the feature-normalization statistics pass of an embedding pipeline
    (e.g. whitening before clustering/ANN).

    Combiner-shaped: each batch reduces its (rows × dim) matrix to ONE
    (dim, n, sum, sumsq) partial table (dim rows, not input rows), the
    final merge groups dim — shuffle volume is O(batches × dim)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "dim": np.arange(mat.shape[1], dtype="int64"),
                "__n": float(mat.shape[0]),
                "__s": mat.sum(axis=0),
                "__s2": (mat * mat).sum(axis=0),
            }
        )

    def final(part: pd.DataFrame) -> pd.DataFrame:
        # all dims of the partition merged in one vectorized groupby
        out = part.groupby("dim", as_index=False, sort=False)[
            ["__n", "__s", "__s2"]
        ].sum()
        mean = out["__s"] / out["__n"]
        var = (out["__s2"] / out["__n"] - mean * mean).clip(lower=0.0)
        std = np.sqrt(var)
        if round_to is not None:
            mean, std = mean.round(round_to), std.round(round_to)
        return pd.DataFrame(
            {"dim": out["dim"], "dim_mean": mean, "dim_std": std}
        )

    from esmarc_ray.ops.relational import partitioned_final

    return partitioned_final(
        embeddings.map_batches(partial, batch_format="pandas"), ["dim"], final
    )


def kmeans(
    embeddings: ray.data.Dataset,
    k: int,
    *,
    n_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 5,
    vector_column: str = "embedding",
    init_sample: int = 20000,
) -> tuple[ray.data.Dataset, np.ndarray, float]:
    """Fully-distributed Lloyd's k-means (Euclidean) over the WHOLE dataset —
    the scale path beyond :class:`IvfIndex`'s driver-sample training.

    Per iteration: centroids broadcast in the task closure; one map_batches
    pass computes each batch's per-centroid (count, vector-sum, inertia)
    partials (vectorized: the ``|x|² − 2xCᵀ`` argmin form, ``np.add.at``
    scatter); the k×n_batches partial rows — k·(d+2) floats per batch,
    independent of row count — are summed on the driver, which updates the
    k×d centroid matrix.  No shuffle at any point; the payload never moves.
    Empty clusters keep their previous centroid.  Stops early when the max
    centroid shift drops below ``tol``.

    Returns ``(assignments, centroids, inertia)``: the input with a
    ``cluster`` column (one final broadcast pass), the k×d float64 centroid
    matrix, and the summed squared distance from the last E-step (i.e.
    under the centroids that produced the final update).
    """
    sample_rows = embeddings.limit(init_sample).take_all()
    sample = np.stack([r[vector_column] for r in sample_rows]).astype(np.float64)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), k, replace=False)].copy()

    def make_partial(cents: np.ndarray):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            counts = np.bincount(assign, minlength=k).astype("float64")
            sums = np.zeros((k, cents.shape[1]))
            np.add.at(sums, assign, mat)
            inertia = float(d2[np.arange(len(mat)), assign].sum())
            return pd.DataFrame(
                {
                    "cid": np.arange(k, dtype="int64"),
                    "count": counts,
                    "vsum": list(sums),
                    "inertia": inertia / k,  # spread so sum over rows == total
                }
            )

        return partial

    inertia = float("inf")
    for _ in range(n_iter):
        parts = embeddings.map_batches(
            make_partial(centroids), batch_format="pandas"
        ).to_pandas()
        counts = parts.groupby("cid")["count"].sum().to_numpy()
        sums = np.zeros_like(centroids)
        for cid, grp in parts.groupby("cid"):
            sums[cid] = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
        inertia = float(parts["inertia"].sum())
        new_centroids = centroids.copy()
        nonzero = counts > 0
        new_centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break

    final = centroids

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ final.T)
            + (final * final).sum(axis=1)[None, :]
        )
        batch = batch.copy()
        batch["cluster"] = d2.argmin(axis=1).astype("int32")
        return batch

    return embeddings.map_batches(label, batch_format="pandas"), centroids, inertia


def pca_components(
    embeddings: ray.data.Dataset,
    n_components: int = 4,
    *,
    vector_column: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA: returns (components [k×d], explained_variance [k],
    mean [d]) of the embedding column.

    Combiner-shaped like :func:`embedding_dim_stats`: each batch reduces to
    ONE (n, sum-vector, sum-outer-product) moment partial — d² + d + 1
    floats per batch, never rows — folded on the driver into the d×d
    covariance whose eigendecomposition is O(d³) driver work (d = embedding
    width, thousands at most; the corpus itself streams once and never
    shuffles).  Eigenvector sign is fixed deterministically (largest-|coef|
    entry positive) so results are reproducible across runs and engines.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "n": [float(mat.shape[0])],
                "s": [mat.sum(axis=0).tobytes()],
                "ss": [(mat.T @ mat).tobytes()],
                "d": [mat.shape[1]],
            }
        )

    n_total, s_acc, ss_acc, dim = 0.0, None, None, None
    for row in embeddings.map_batches(partial, batch_format="pandas").iter_rows():
        dim = int(row["d"])
        s = np.frombuffer(row["s"], dtype=np.float64)
        ss = np.frombuffer(row["ss"], dtype=np.float64).reshape(dim, dim)
        n_total += row["n"]
        s_acc = s if s_acc is None else s_acc + s
        ss_acc = ss if ss_acc is None else ss_acc + ss
    mean = s_acc / n_total
    cov = ss_acc / n_total - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = eigvecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coef| entry of each component positive
    flips = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return comps, eigvals[order], mean


def pca_transform(
    embeddings: ray.data.Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Project each embedding onto PCA components (broadcast k×d matrix,
    one matmul per batch): returns (id_column, pc0..pc{k-1})."""
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        proj = (mat - mu) @ comps.T
        if round_to is not None:
            proj = np.floor(proj * 10**round_to + 0.5) / 10**round_to
        out = {id_column: batch[id_column].to_numpy()}
        for i in range(comps.shape[0]):
            out[f"pc{i}"] = proj[:, i]
        return pd.DataFrame(out)

    return embeddings.map_batches(project, batch_format="pandas")


def quantize_embeddings(
    embeddings: ray.data.Dataset,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """Per-vector max-abs int8 quantization — the storage scale path for ANN
    shards (4× smaller than float32, dot products stay rank-correlated).
    ``q = trunc(127·x / max|x|)`` per vector; truncation (not rounding)
    keeps the arithmetic bit-identical across engines with no tie rule.

    Map-only, zero shuffle.  Emits long form (id, pos, q) so the result is
    hash-comparable column-wise."""

    def quant(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        m = np.abs(mat).max(axis=1, keepdims=True)
        scale = np.where(m == 0.0, 1.0, m)
        q = np.trunc(127.0 * mat / scale).astype(np.int64)
        n, d = mat.shape
        return pd.DataFrame(
            {
                id_column: np.repeat(batch[id_column].to_numpy(), d),
                "pos": np.tile(np.arange(d, dtype=np.int64), n),
                "q": q.ravel(),
            }
        )

    return embeddings.map_batches(quant, batch_format="pandas")


@derive_width
def als_factorize(
    ratings: ray.data.Dataset,
    *,
    user_column: str = "user",
    item_column: str = "item",
    rating_column: str = "rating",
    rank: int = 8,
    iterations: int = 5,
    reg: float = 0.1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Distributed Alternating Least Squares matrix factorization
    (Zhou et al. 2008, "Large-scale Parallel Collaborative Filtering") —
    the classic implicit/explicit recommender factorizer.

    Each half-step is fully combiner-shaped, never a task per entity:

    1. the CURRENT side's factor table broadcasts into a ``map_batches``
       pass over the ratings, where each batch reduces to per-entity normal
       equation partials ``(A_u += q_i q_iᵀ, b_u += r·q_i)`` — k²+k floats
       per (batch × entity), not per rating;
    2. partials hash-partition by entity and each partition solves its
       entities' k×k systems with ONE stacked ``np.linalg.solve`` call.

    The factor tables are O(entities × k).  This implementation broadcasts
    the opposite side's factors each half-step (the standard
    broadcast-ALS plan: right for the common case where at least one side —
    items — fits a worker; a 100-TB two-giant-sides run would swap the
    broadcast for a third co-partitioned exchange of the factor table,
    same partial algebra).  Deterministic: factors init from a seeded RNG
    keyed by entity hash order, and every solve consumes summed partials.

    Returns (user_factors, item_factors) as pandas DataFrames with columns
    [entity, f0..f{k-1}].
    """
    from esmarc_ray.ops.relational import partial_groupby_agg, partitioned_final

    k = rank

    def narrow(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": batch[user_column].astype(str),
                "i": batch[item_column].astype(str),
                "r": batch[rating_column].astype("float64"),
            }
        )

    rat = ratings.map_batches(narrow, batch_format="pandas").materialize()

    # deterministic per-item init: hash-seeded uniform rows (entity order
    # independent — each entity's row derives from its own name)
    def init_rows(names: pd.Series) -> pd.DataFrame:
        import zlib

        rows = np.empty((len(names), k), dtype="float64")
        for j, name in enumerate(names):  # runs once over DISTINCT entities
            rng = np.random.RandomState(
                (zlib.crc32(name.encode()) ^ seed) & 0x7FFFFFFF
            )
            rows[j] = rng.uniform(0.1, 1.0, k)
        out = pd.DataFrame(rows, columns=[f"f{j}" for j in range(k)])
        out.insert(0, "entity", names.to_numpy())
        return out

    items = (
        partial_groupby_agg(
            rat.map_batches(
                lambda b: b[["i"]].drop_duplicates(), batch_format="pandas"
            ),
            ["i"],
            {"n": ("i", "count")},
        )
        .to_pandas()["i"]
    )
    item_f = init_rows(items)
    user_f: pd.DataFrame | None = None

    def half_step(fixed: pd.DataFrame, group_col: str, other_col: str):
        fcols = [f"f{j}" for j in range(k)]
        fixed_idx = fixed.set_index("entity")[fcols]

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            # vectorized broadcast-side gather: one indexed .loc, no row loop
            q = fixed_idx.loc[batch[other_col].to_numpy()].to_numpy()
            r = batch["r"].to_numpy()
            outer = q[:, :, None] * q[:, None, :]  # (n, k, k)
            rq = q * r[:, None]
            df = pd.DataFrame(
                {
                    "e": batch[group_col].to_numpy(),
                }
            )
            flat = outer.reshape(len(batch), k * k)
            for j in range(k * k):
                df[f"a{j}"] = flat[:, j]
            for j in range(k):
                df[f"b{j}"] = rq[:, j]
            return df.groupby("e", as_index=False).sum()

        def solve(part: pd.DataFrame) -> pd.DataFrame:
            g = part.groupby("e", as_index=False).sum()
            a = g[[f"a{j}" for j in range(k * k)]].to_numpy().reshape(-1, k, k)
            b = g[[f"b{j}" for j in range(k)]].to_numpy()
            a = a + reg * np.eye(k)[None, :, :]
            sol = np.linalg.solve(a, b)  # stacked: one LAPACK call for all
            out = pd.DataFrame(sol, columns=[f"f{j}" for j in range(k)])
            out.insert(0, "entity", g["e"].to_numpy())
            return out

        return partitioned_final(
            rat.map_batches(partials, batch_format="pandas"),
            ["e"],
            solve,
            num_partitions=num_partitions,
        ).to_pandas()

    for _ in range(iterations):
        user_f = half_step(item_f, "u", "i")
        item_f = half_step(user_f, "i", "u")
    return user_f, item_f


def als_rmse(
    ratings: ray.data.Dataset,
    user_f: pd.DataFrame,
    item_f: pd.DataFrame,
    *,
    user_column: str = "user",
    item_column: str = "item",
    rating_column: str = "rating",
) -> float:
    """Distributed RMSE of an ALS factorization: factors broadcast, each
    batch reduces to (sq_err_sum, n) partials."""
    k = sum(c.startswith("f") for c in user_f.columns)
    cols = [f"f{j}" for j in range(k)]
    umap = dict(zip(user_f["entity"], map(tuple, user_f[cols].to_numpy())))
    imap = dict(zip(item_f["entity"], map(tuple, item_f[cols].to_numpy())))

    def err(batch: pd.DataFrame) -> pd.DataFrame:
        u = np.stack([umap[str(e)] for e in batch[user_column]])
        v = np.stack([imap[str(e)] for e in batch[item_column]])
        pred = (u * v).sum(axis=1)
        d = batch[rating_column].to_numpy(dtype="float64") - pred
        return pd.DataFrame({"se": [float((d * d).sum())], "n": [len(d)]})

    parts = ratings.map_batches(err, batch_format="pandas").to_pandas()
    return float(np.sqrt(parts["se"].sum() / parts["n"].sum()))


def pq_train(
    embeddings: ray.data.Dataset,
    *,
    m: int = 4,
    k_codes: int = 16,
    n_iter: int = 8,
    tol: float = 1e-4,
    seed: int = 7,
    vector_column: str = "embedding",
    init_sample: int = 20000,
) -> np.ndarray:
    """Train product-quantization codebooks (m subspaces × k_codes
    centroids each) with the same zero-shuffle moment-partial scheme as
    :func:`kmeans`, but for ALL m subspaces in one pass per iteration: each
    batch emits m·k rows of (subspace, cid, count, subvector-sum) partials
    — m·k·(d/m+2) floats regardless of row count — and the driver folds
    them into the (m, k, d/m) codebook tensor.  Only the k-row init sample
    ever reaches the driver; the payload never moves.

    Returns codebooks with shape ``(m, k_codes, d // m)``; d must divide m.
    """
    sample_rows = embeddings.limit(init_sample).take_all()
    sample = np.stack([r[vector_column] for r in sample_rows]).astype(np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.stack(
        [
            sample[rng.choice(len(sample), k_codes, replace=False), j * dsub:(j + 1) * dsub]
            for j in range(m)
        ]
    )  # (m, k, dsub)

    def make_partial(cb: np.ndarray):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
            rows = {"sub": [], "cid": [], "count": [], "vsum": []}
            for j in range(m):
                x = mat[:, j * dsub:(j + 1) * dsub]
                c = cb[j]
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                assign = d2.argmin(axis=1)
                counts = np.bincount(assign, minlength=k_codes).astype("float64")
                sums = np.zeros((k_codes, dsub))
                np.add.at(sums, assign, x)
                rows["sub"].extend([j] * k_codes)
                rows["cid"].extend(range(k_codes))
                rows["count"].extend(counts)
                rows["vsum"].extend(list(sums))
            return pd.DataFrame(rows)

        return partial

    for _ in range(n_iter):
        parts = embeddings.map_batches(
            make_partial(books), batch_format="pandas"
        ).to_pandas()
        new_books = books.copy()
        shift = 0.0
        for (j, cid), grp in parts.groupby(["sub", "cid"]):
            cnt = grp["count"].sum()
            if cnt > 0:
                cen = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0) / cnt
                shift = max(shift, float(np.abs(cen - books[j, cid]).max()))
                new_books[j, cid] = cen
        books = new_books
        if shift < tol:
            break
    return books


def pq_encode(
    embeddings: ray.data.Dataset,
    codebooks: np.ndarray,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """Encode every vector to its m uint8 codebook indices (one broadcast
    map pass; (m, k, dsub) codebooks ride the task closure).  Output:
    (id, codes:list<uint8>) — d·4 bytes/vector compressed to m bytes."""
    m, k_codes, dsub = codebooks.shape

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            x = mat[:, j * dsub:(j + 1) * dsub]
            c = codebooks[j]
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({id_column: batch[id_column], "codes": list(codes)})

    return embeddings.map_batches(encode, batch_format="pandas")


def pq_search(
    codes: ray.data.Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_column: str = "vec_id",
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query one (m, k)
    lookup table of exact query-subvector → centroid distances; per batch
    the approximate distance is an m-way table gather + sum (no float
    reconstruction).  Local top-k per block, k × blocks driver heap merge —
    the same merge discipline as :func:`brute_force_topk`.
    Returns (query_id, id, adc_d2) ascending by distance."""
    m, k_codes, dsub = codebooks.shape
    q = np.asarray(queries, dtype=np.float64)
    nq = q.shape[0]
    # dist tables: (nq, m, k)
    tables = np.stack(
        [
            ((q[:, j * dsub:(j + 1) * dsub][:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        cds = np.stack(batch["codes"].to_numpy())  # (n, m)
        n = len(cds)
        out = {"query_id": [], id_column: [], "adc_d2": []}
        ids = batch[id_column].to_numpy()
        for qi in range(nq):
            d2 = tables[qi, np.arange(m)[None, :], cds].sum(axis=1)  # (n,)
            kk = min(k, n)
            idx = np.argpartition(d2, kk - 1)[:kk]
            out["query_id"].extend([qi] * kk)
            out[id_column].extend(ids[idx])
            out["adc_d2"].extend(d2[idx])
        return pd.DataFrame(out)

    partials = codes.map_batches(local_topk, batch_format="pandas")
    best: dict[int, list] = {}
    for batch in partials.iter_batches(batch_format="pandas"):
        for qi, vid, d2 in zip(batch["query_id"], batch[id_column], batch["adc_d2"]):
            heap = best.setdefault(int(qi), [])
            item = (-float(d2), int(vid))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows = []
    for qi, heap in sorted(best.items()):
        for negd2, vid in sorted(heap, reverse=True):
            rows.append({"query_id": qi, id_column: vid, "adc_d2": -negd2})
    return pd.DataFrame(rows)


def kcenter_coreset(
    embeddings: ray.data.Dataset,
    k: int,
    *,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    candidates_per_block: int | None = None,
) -> pd.DataFrame:
    """Greedy k-center CORESET selection — the diversity-sampling curation
    step ("pick k maximally spread examples"): two-round distributed
    approximation of farthest-point traversal.

    Determinism caveat (verified by the round-5 4-vs-32-CPU hash scan):
    the block-local candidate pools follow block BOUNDARIES, so the chosen
    coreset is reproducible per cluster size, not across sizes — the
    coverage guarantee (pytest-gated) holds under any blocking.

    Round 1 (distributed): every block runs the exact greedy farthest-point
    sweep LOCALLY (seeded at its smallest id; k iterations of one
    vectorized distance update each) and emits only its
    ``candidates_per_block`` (default k) picks.  Round 2 (driver): the
    exact greedy sweep over the pooled candidates (blocks × k rows — never
    the corpus), seeded at the global smallest candidate id so the result
    is deterministic and partition-invariant for the seed point.

    This is the standard composable 2-round k-center scheme: each block's
    local sweep is a 2-approximation of its own data's cover, and the
    driver sweep over the union preserves the spread guarantee on the
    pooled candidates.  Not SQL-expressible (sequential greedy) — gated by
    tests/test_ops.py::test_kcenter_coreset_covers_planted_clusters.
    """
    cpb = candidates_per_block or k

    def local_pick(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy()
        mat = np.stack(batch[vector_column].to_numpy()).astype(np.float64)
        take = _greedy_kcenter(ids, mat, min(cpb, len(ids)))
        return pd.DataFrame(
            {id_column: ids[take], vector_column: list(mat[take])}
        )

    pool = embeddings.map_batches(local_pick, batch_format="pandas").to_pandas()
    ids = pool[id_column].to_numpy()
    mat = np.stack(pool[vector_column].to_numpy())
    take = _greedy_kcenter(ids, mat, min(k, len(ids)))
    out = pd.DataFrame({id_column: np.sort(ids[take])})
    return out


def _greedy_kcenter(ids: np.ndarray, mat: np.ndarray, k: int) -> np.ndarray:
    """Exact greedy farthest-point traversal, seeded at the smallest id;
    ties on distance break toward the smaller id (deterministic)."""
    order = np.argsort(ids, kind="stable")
    ids, inv = ids[order], order
    mat = mat[order]
    chosen = [0]
    d2 = ((mat - mat[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        far = int(np.argmax(d2))  # argmax takes the FIRST max → smallest id
        if d2[far] <= 0.0:
            break
        chosen.append(far)
        nd2 = ((mat - mat[far]) ** 2).sum(axis=1)
        d2 = np.minimum(d2, nd2)
    return inv[np.array(chosen)]
