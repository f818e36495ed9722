"""Mergeable sketch operators: HyperLogLog distinct counting and
Misra–Gries heavy hitters.

Both follow the engine's combiner idiom (one small partial per batch ×
group, merged in a final reduce), and both are *mergeable summaries* in the
Agarwal-et-al. sense — the partial→merge split is exact, not heuristic, so
the plan is scale-safe: shuffle volume is O(batches × groups × sketch_size)
regardless of input rows.

* :func:`hll_distinct_count` — approximate COUNT(DISTINCT v) per group.
  Standard HLL (Flajolet et al. 2007) with 2^p registers and the
  linear-counting small-range correction; relative error ≈ 1.04/sqrt(2^p)
  (p=12 → ~1.6%).  The exact-:func:`~esmarc_ray.ops.relational.distinct_count`
  shuffles every unique (group, value) pair; this shuffles 2^p bytes per
  (batch, group) — the scale path when per-group cardinality is huge.
* :func:`heavy_hitters` — top-k frequent values via a Misra–Gries summary
  (capacity m ⇒ per-term undercount ≤ N/(m+1)) to find candidates, then ONE
  distributed exact recount restricted to the ≤m candidates.  The result is
  exact top-k whenever every true top-k term's frequency exceeds N/(m+1) —
  the full wordcount's shuffle (every distinct term from every batch) is
  replaced by m candidate rows per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from esmarc_ray.config import derive_width


_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hll_alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _hll_registers(values: pd.Series) -> np.ndarray:
    """Max rank-of-first-one per register for one batch of values."""
    h = pd.util.hash_pandas_object(values.astype(str), index=False).to_numpy(
        dtype=np.uint64
    )
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - _HLL_P)) - 1)
    # rank = leading zeros within the (64-p)-bit suffix + 1; suffix ints are
    # < 2^52 so float64 log2 is exact on them (and exact on powers of two)
    rank = np.empty(len(h), dtype=np.int64)
    zero = rest == 0
    rank[zero] = (64 - _HLL_P) + 1
    nz = ~zero
    rank[nz] = (64 - _HLL_P) - np.floor(np.log2(rest[nz].astype(np.float64))).astype(
        np.int64
    )
    regs = np.zeros(_HLL_M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    m = float(_HLL_M)
    est = _hll_alpha(_HLL_M) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * _HLL_M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return int(round(est))


def hll_distinct_count(
    ds: ray.data.Dataset,
    group_keys: list[str],
    value_column: str,
    out_name: str = "approx_distinct",
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT value_column) per group via HLL."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, grp in batch.groupby(group_keys, sort=False):
            key_vals = kv if isinstance(kv, tuple) else (kv,)
            rows.append(
                dict(zip(group_keys, key_vals))
                | {"__regs": _hll_registers(grp[value_column]).tobytes()}
            )
        return pd.DataFrame(rows, columns=group_keys + ["__regs"])

    def final(part: pd.DataFrame) -> pd.DataFrame:
        # register-max merge per group, looped INSIDE the partition task —
        # no Ray dispatch per distinct key
        rows = []
        for key_vals, group in part.groupby(group_keys, sort=False):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            regs = np.zeros(_HLL_M, dtype=np.int8)
            for blob in group["__regs"]:
                np.maximum(regs, np.frombuffer(blob, dtype=np.int8), out=regs)
            rows.append(dict(zip(group_keys, key_vals)) | {out_name: _hll_estimate(regs)})
        return pd.DataFrame(rows, columns=group_keys + [out_name])

    from esmarc_ray.ops.relational import partitioned_final

    return partitioned_final(
        ds.map_batches(partial, batch_format="pandas"), group_keys, final
    )


def _mg_summarize(counts: pd.Series, capacity: int) -> pd.Series:
    """Misra–Gries reduce: keep ≤capacity counters, decrementing all by the
    (capacity+1)-th largest so dropped terms' counts are absorbed."""
    if len(counts) <= capacity:
        return counts
    counts = counts.sort_values(ascending=False)
    cut = counts.iloc[capacity]
    kept = counts.iloc[:capacity] - cut
    return kept[kept > 0]


def heavy_hitters(
    docs: ray.data.Dataset,
    column: str,
    k: int = 10,
    *,
    capacity: int = 4096,
    split_tokens: bool = True,
) -> pd.DataFrame:
    """Exact top-k frequent tokens (or values) with a Misra–Gries candidate
    pass: per-batch MG summaries (≤capacity counters each) merge on the
    driver into a global candidate set, then a distributed exact count runs
    over ONLY the candidates.  Returns (term, n) sorted by (n desc, term) —
    provably the true top-k when freq(k-th term) > N/(capacity+1); below
    that the MG guarantee degrades gracefully (candidates may miss tail
    terms, never over-count)."""
    from esmarc_ray.ops.relational import partial_groupby_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[column].astype(str)
        if split_tokens:
            vals = vals.str.split().explode()
        counts = _mg_summarize(vals.value_counts(), capacity)
        return pd.DataFrame({"term": counts.index, "n": counts.to_numpy()})

    partials = docs.map_batches(partial, batch_format="pandas").to_pandas()
    merged = _mg_summarize(partials.groupby("term")["n"].sum(), capacity)
    candidates = set(merged.index)

    def count_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[column].astype(str)
        if split_tokens:
            vals = vals.str.split().explode()
        vals = vals[vals.isin(candidates)]
        return pd.DataFrame({"term": vals.to_numpy()})

    exact = partial_groupby_agg(
        docs.map_batches(count_candidates, batch_format="pandas"),
        ["term"],
        {"n": ("term", "count")},
    ).to_pandas()
    exact = exact.sort_values(["n", "term"], ascending=[False, True]).head(k)
    return exact.reset_index(drop=True)


# -- Bloom filter ----------------------------------------------------------------


def _bloom_hashes(values: pd.Series, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, len) bit positions via double hashing h1 + i·h2."""
    s = values.astype(str)
    h1 = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    h2 = pd.util.hash_pandas_object(s + "\x1fb2", index=False).to_numpy(dtype=np.uint64)
    h2 |= np.uint64(1)  # odd => cycles through all positions
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def bloom_build(
    keys: ray.data.Dataset,
    column: str,
    *,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> np.ndarray:
    """Mergeable Bloom filter of a key column: each batch sets its bits
    locally (one packed uint8 array per batch), partials OR together —
    sketch size is fixed (1 MiB at the default 2^23 bits) regardless of key
    count.  False-positive rate ≈ (1-e^{-kn/m})^k — at 1M keys, 2^23 bits,
    4 hashes: ~1.2%."""
    nbytes = n_bits // 8

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_hashes(batch[column].dropna(), n_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"__bits": [bits.tobytes()]})

    merged = np.zeros(nbytes, dtype=np.uint8)
    for batch in keys.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for blob in batch["__bits"]:
            np.bitwise_or(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return merged


@derive_width
def bloom_semi_join(
    big: ray.data.Dataset,
    keys: ray.data.Dataset,
    on: str,
    *,
    key_column: str | None = None,
    anti: bool = False,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT semi/anti join with a Bloom prefilter: the big side tests each
    row against the broadcast filter batch-locally, so only *maybe-member*
    rows enter the exact hash-partitioned join — Bloom negatives are certain,
    so for ``anti=True`` they stream straight to the output with ZERO
    shuffle, and for semi they drop immediately.  At a 1% FP rate the
    shuffle shrinks to ~(|matches| + 1% of non-matches) rows: the classic
    build-side-filter pushdown of distributed query engines, here as a
    composition of :func:`bloom_build` + the repo's
    :func:`~esmarc_ray.ops.relational.partitioned_semi_join`."""
    from esmarc_ray.ops.relational import partitioned_semi_join

    key_column = key_column or on
    keys = keys.materialize()  # consumed twice: bloom build + exact join
    bits_ref = ray.put(bloom_build(keys, key_column, n_bits=n_bits, n_hashes=n_hashes))

    def test(batch: pd.DataFrame, *, want_maybe: bool) -> pd.DataFrame:
        bits = ray.get(bits_ref) if isinstance(bits_ref, ray.ObjectRef) else bits_ref
        pos = _bloom_hashes(batch[on], n_bits, n_hashes)
        hit = np.ones(len(batch), dtype=bool)
        for row in pos:
            hit &= (bits[row >> 3] >> (row & 7).astype(np.uint8)) & 1 == 1
        null_key = batch[on].isna().to_numpy()
        maybe = hit & ~null_key  # SQL semantics: null keys never match
        if want_maybe:
            return batch[maybe]
        return batch[~maybe] if anti else batch.iloc[0:0]

    maybe = big.map_batches(test, batch_format="pandas", fn_kwargs={"want_maybe": True})
    exact = partitioned_semi_join(
        maybe, keys, on, key_column=key_column, anti=anti,
        num_partitions=num_partitions,
    )
    if not anti:
        return exact
    certain_miss = big.map_batches(
        test, batch_format="pandas", fn_kwargs={"want_maybe": False}
    )
    return certain_miss.union(exact)


def _cms_hash(values: pd.Series, row: int, width: int) -> np.ndarray:
    # independent rows via seeded string salt, same C-siphash kernel as
    # the partition routers
    return (
        pd.util.hash_pandas_object(
            values.astype(str) + f"\x1fcms{row}", index=False
        ).to_numpy()
        % width
    ).astype(np.int64)


def count_min_sketch(
    ds: ray.data.Dataset,
    value_column: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> np.ndarray:
    """Count–min sketch of a value column: a (depth × width) counter grid;
    point-frequency estimate = min over rows of the addressed counters —
    always an OVERestimate, with error ≤ 2N/width at probability ≥
    1 − 2^−depth (Cormode & Muthukrishnan 2005).

    Mergeable-summary combiner: each batch reduces to its own grid
    (depth·width ints, never rows) and grids fold by elementwise addition on
    the driver — shuffle volume O(batches × depth × width) at any corpus
    size.  Use when the distinct-value universe is too large even for a
    Misra–Gries candidate pass (:func:`heavy_hitters`)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros((depth, width), dtype=np.int64)
        vals = batch[value_column]
        for r in range(depth):
            np.add.at(grid[r], _cms_hash(vals, r, width), 1)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    acc = np.zeros((depth, width), dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pandas").iter_rows():
        acc += np.frombuffer(row["grid"], dtype=np.int64).reshape(depth, width)
    return acc


def cms_estimate(grid: np.ndarray, values: pd.Series) -> np.ndarray:
    """Point-frequency estimates for ``values`` from a count-min grid."""
    depth, width = grid.shape
    ests = np.stack(
        [grid[r][_cms_hash(values, r, width)] for r in range(depth)]
    )
    return ests.min(axis=0)


def hll_overlap(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    value_column: str,
) -> dict:
    """Estimated set overlap between two datasets' value columns via HLL
    inclusion–exclusion: |A∩B| ≈ hll(A) + hll(B) − hll(A ∪ B) — the join-
    cardinality / audience-overlap estimator that never shuffles either
    side (three register-array folds, 2^p bytes per batch).

    Returns {"a", "b", "union", "intersection"} estimates.  Relative error
    of each term ≈ 1.04/√2^p; the intersection inherits the absolute errors
    of all three (poor when the true overlap is tiny — documented)."""

    def fold(ds: ray.data.Dataset) -> np.ndarray:
        regs = np.zeros(_HLL_M, dtype=np.int8)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            r = _hll_registers(batch[value_column])
            return pd.DataFrame({"regs": [r.tobytes()]})

        for row in ds.map_batches(partial, batch_format="pandas").iter_rows():
            regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.int8))
        return regs

    ra, rb = fold(a), fold(b)
    est_a = _hll_estimate(ra)
    est_b = _hll_estimate(rb)
    est_u = _hll_estimate(np.maximum(ra, rb))
    return {
        "a": est_a,
        "b": est_b,
        "union": est_u,
        "intersection": max(0, est_a + est_b - est_u),
    }
