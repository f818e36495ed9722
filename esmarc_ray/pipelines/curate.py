"""End-to-end pretraining-data curation pipeline.

Composes the repo's curation operators into ONE streaming pass over the
document table — the standard corpus-cleaning recipe (C4/Gopher-style
quality gates → language gate → benchmark decontamination → exact dedup →
MinHash near-dedup) with dead-letter accounting:

* every heuristic stage ANNOTATES a ``drop_reason`` column instead of
  filtering, so all per-stage scoring fuses into one ``map_batches`` chain
  (Ray fuses consecutive task-pool maps — the payload crosses the object
  store once) and the attrition report is a single combiner aggregation of
  the same stream, never a re-execution per stage;
* reasons apply in a fixed precedence (first failing gate wins) so the
  attrition counts partition the corpus exactly: sum(report.n) == |input|;
* the dedup stages run only on the survivors (payload already shrunk) —
  exact first (cheap hash partition), then MinHash+LSH near-dup (bucketed;
  see ops/dedup.py for the scale plan).

Deterministic end to end: gates are pure functions of the row, exact dedup
keeps the smallest doc_id per text, and minhash_dedup keeps the smallest id
per near-dup cluster.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from esmarc_ray.ops.dedup import exact_dedup, minhash_dedup
from esmarc_ray.ops.relational import partial_groupby_agg
from esmarc_ray.ops.text import (
    _langid_batch,
    _quality_batch,
    _repetition_row,
    _shingle_set,
    _token_stats_batch,
)


DEFAULT_GATES = {
    "min_tokens": 10,
    "max_punct_ratio": 0.20,
    "min_stopword_ratio": 0.01,
    "max_dup_line_frac": 0.30,
    "max_top_bigram_frac": 0.20,
    "allowed_langs": None,  # e.g. {"en", "de"}; None = keep all
    "contam_ngram": 8,
    "contam_min_hits": 1,
}


def curate_documents(
    docs: ray.data.Dataset,
    *,
    benchmark_texts: "list[str] | None" = None,
    id_column: str = "doc_id",
    text_column: str = "text",
    minhash_threshold: float = 0.8,
    near_dedup: "str | None" = "minhash",
    jaccard_threshold: float = 0.9,
    checkpoint_dir: "str | None" = None,
    **gate_overrides,
) -> tuple[ray.data.Dataset, ray.data.Dataset, pd.DataFrame]:
    """Returns ``(kept_docs, annotated_docs, attrition_report)``.

    ``annotated_docs`` is the full input with the scoring columns +
    ``drop_reason`` ("" = kept); ``attrition_report`` is the small
    (drop_reason, n) table, computed with the combiner idiom.  Near-dup
    removal happens after the report (its victims are not gate failures);
    the report's ``kept`` row is therefore an upper bound on final rows.

    ``near_dedup`` selects the near-duplicate stage: ``"minhash"``
    (default; LSH-approximate, the 100 TB path), ``"jaccard"`` (EXACT
    token-set Jaccard + connected components — deterministic and fully
    SQL-checkable end to end, the correctness anchor), or ``None`` (gates +
    exact dedup only).

    ``checkpoint_dir``: where the annotated stream parks between its three
    consumers (default: a fresh tmp dir) — parquet checkpoint, not
    ``materialize()``, so the corpus spills to disk and a failed run can
    resume from it.
    """
    if near_dedup not in ("minhash", "jaccard", None):
        raise ValueError(near_dedup)
    gates = {**DEFAULT_GATES, **gate_overrides}
    bench: set[str] = set()
    for t in benchmark_texts or []:
        bench.update(_shingle_set(t, gates["contam_ngram"]))

    def annotate(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _token_stats_batch(batch.copy())
        batch = _quality_batch(batch)
        batch = _langid_batch(batch)
        trip = [_repetition_row(t) for t in batch[text_column].fillna("")]
        batch["dup_line_frac"] = [t[0] for t in trip]
        batch["top_bigram_frac"] = [t[2] for t in trip]
        if bench:
            batch["contam_hits"] = pd.Series(
                [len(_shingle_set(t, gates["contam_ngram"]) & bench)
                 for t in batch[text_column].fillna("")],
                index=batch.index, dtype="int64",
            )
        else:
            batch["contam_hits"] = 0

        reason = pd.Series("", index=batch.index, dtype="object")

        def gate(mask: pd.Series, name: str) -> None:
            nonlocal reason
            reason = reason.mask((reason == "") & mask, name)

        gate(batch["n_tokens_ws"] < gates["min_tokens"], "too_short")
        gate(batch["punct_ratio"] > gates["max_punct_ratio"], "punct")
        gate(batch["stopword_ratio"] < gates["min_stopword_ratio"], "stopwords")
        gate(batch["dup_line_frac"] > gates["max_dup_line_frac"], "repetitive_lines")
        gate(batch["top_bigram_frac"] > gates["max_top_bigram_frac"], "repetitive_bigrams")
        if gates["allowed_langs"] is not None:
            gate(~batch["lang_pred"].isin(gates["allowed_langs"]), "language")
        gate(batch["contam_hits"] >= gates["contam_min_hits"], "contaminated")
        batch["drop_reason"] = reason
        return batch

    # checkpoint the annotated stream: it has three consumers (report,
    # survivor filter, caller) and a lazy Dataset re-executes its upstream
    # once per consumer.  A parquet checkpoint is the scale-safe form — it
    # spills to disk instead of pinning the corpus in the object store
    # (materialize()) and a re-run can resume from it.
    annotated = docs.map_batches(annotate, batch_format="pandas")
    if checkpoint_dir is None:
        # deterministic per-process scratch path: reused (and wiped) by every
        # unnamed run in this process rather than leaking one corpus-sized
        # checkpoint per invocation; removed at interpreter exit too
        import atexit
        import os
        import pathlib
        import shutil
        import tempfile

        checkpoint_dir = str(
            pathlib.Path(tempfile.gettempdir()) / f"esmarc_ray_curate_{os.getpid()}"
        )
        if pathlib.Path(checkpoint_dir).exists():
            shutil.rmtree(checkpoint_dir)
        atexit.register(shutil.rmtree, checkpoint_dir, True)
    else:
        # parquet file names are unique per run: a reused checkpoint dir
        # would read old+new files and double-count every row — wipe first
        import pathlib
        import shutil

        if pathlib.Path(checkpoint_dir).exists():
            shutil.rmtree(checkpoint_dir)
    annotated.write_parquet(checkpoint_dir)
    annotated = ray.data.read_parquet(checkpoint_dir)

    report = (
        partial_groupby_agg(
            annotated.map_batches(
                lambda b: pd.DataFrame(
                    {"drop_reason": b["drop_reason"].replace("", "kept")}
                ),
                batch_format="pandas",
            ),
            ["drop_reason"],
            {"n": ("drop_reason", "count")},
        )
        .to_pandas()
        .sort_values("drop_reason")
        .reset_index(drop=True)
    )

    survivors = annotated.filter(expr="drop_reason == ''").select_columns(
        [id_column, text_column]
    )
    deduped = exact_dedup(survivors, text_column, id_column)
    if near_dedup == "minhash":
        kept, _clusters = minhash_dedup(deduped, threshold=minhash_threshold)
    elif near_dedup == "jaccard":
        from esmarc_ray.ops.dedup import jaccard_dedup

        kept, _clusters = jaccard_dedup(
            deduped, threshold=jaccard_threshold,
            id_column=id_column, text_column=text_column,
        )
    else:
        kept = deduped
    return kept, annotated, report
