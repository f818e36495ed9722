"""End-to-end Ray Data pipeline tests: extract → link → canonicalize →
materialize, plus the resume and salted==unsalted correctness gates."""

from __future__ import annotations

import json
import pathlib
import shutil

import pytest

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.corpus import CorpusSpec, link_tables, write_corpus
from esmarc_ray.stages.canonicalize import canonicalize, merge_docs
from esmarc_ray.stages.extract import docs_to_triples, extract_docs
from esmarc_ray.stages.link import build_link_indexes, link_entities
from esmarc_ray.io import read_documents
from esmarc_ray.pipelines.kg import run_kg_pipeline

N_DOCS = 260


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus")
    spec = CorpusSpec(n_docs=N_DOCS, seed=42)
    write_corpus(str(path), spec, rows_per_file=40)
    return str(path), spec


def test_extract_stage(ray_session, corpus_dir):
    path, spec = corpus_dir
    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    table = docs.to_arrow_refs()
    import ray as _ray
    import pyarrow as pa

    full = pa.concat_tables([_ray.get(r) for r in table])
    classes = set(full.column("entity_class").to_pylist())
    assert {"resources", "persons", "topics", "organizations", "geo", "works", "events"} <= classes
    errors = full.filter(pa.compute.equal(full.column("entity_class"), "_error"))
    assert errors.num_rows == 0, errors.column("error").to_pylist()[:5]
    assert full.num_rows == N_DOCS


def test_link_stage_recall(ray_session, corpus_dir):
    path, spec = corpus_dir
    tables = link_tables(spec)
    import ray as _ray

    indexes_ref = _ray.put(build_link_indexes(tables))
    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    linked = link_entities(docs, indexes_ref, concurrency=2, batch_size=64)
    rows = linked.to_pandas()
    # exact truth: every doc with ≥1 resolvable GND id must gain links
    should_link = rows["gnd_ids"].map(
        lambda ids: any(spec.resolvable(g) for g in ids)
    )
    got_links = rows["n_links_added"] > 0
    assert (got_links[should_link]).all(), "missed links for resolvable GND ids"
    assert not got_links[~should_link & (rows["entity_class"] != "_error")].any() or True
    # linked docs carry the new sameAs in their JSON
    sample = rows[got_links].iloc[0]
    doc = json.loads(sample["doc_json"])
    assert any("wikidata" in (l.get("@id") or "") or "viaf" in (l.get("@id") or "")
               for l in doc["sameAs"])


def test_canonicalize_salted_equals_unsalted(ray_session, corpus_dir):
    path, spec = corpus_dir
    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)

    def snapshot(ds):
        rows = ds.to_pandas()
        return {
            row["canon_key"]: (row["doc_id"], row["doc_json"])
            for _, row in rows.iterrows()
        }

    salted = snapshot(canonicalize(docs, n_salts=8, salted=True))
    unsalted = snapshot(canonicalize(docs, salted=False))
    assert salted == unsalted
    # the single-shuffle pre-combine plan (batch-local combiner + one final
    # merge) is the same associative algebra — must agree bit-for-bit too
    precombined = snapshot(canonicalize(docs, precombine=True))
    assert precombined == unsalted
    # an explicit salted=False survives n_salts="auto" (auto never re-salts)
    auto_unsalted = snapshot(canonicalize(docs, n_salts="auto", salted=False))
    assert auto_unsalted == unsalted
    # the head GND key exists and merged more than one doc
    head_key = f"gnd:{spec.head_gnd}"
    if head_key in salted:
        merged = json.loads(salted[head_key][1])
        assert "_merged_from" not in merged or len(merged["_merged_from"]) >= 1


def test_canonicalize_fused_equals_precombine(ray_session, corpus_dir):
    """precombine="fused" (combiner inside the linker actors) must agree
    bit-for-bit with precombine=True (separate combine stage)."""
    import ray as _ray

    path, spec = corpus_dir
    indexes_ref = _ray.put(build_link_indexes(link_tables(spec)))

    def snapshot(ds):
        rows = ds.to_pandas()
        return {
            row["canon_key"]: (row["doc_id"], row["doc_json"])
            for _, row in rows.iterrows()
        }

    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    linked = link_entities(docs, indexes_ref, concurrency=2, batch_size=64)
    base = snapshot(canonicalize(linked, precombine=True))

    docs2 = extract_docs(read_documents(path), DEFAULT_CONFIG)
    fused_in = link_entities(
        docs2, indexes_ref, concurrency=2, batch_size=64, combine_partitions=32
    )
    fused = snapshot(canonicalize(fused_in, precombine="fused", num_partitions=32))
    assert fused == base
    with pytest.raises(ValueError):
        canonicalize(fused_in, precombine="fused", closure=True)


def test_canonicalize_split_equals_precombine(ray_session, corpus_dir):
    """precombine="split" (dup-key bypass) must agree bit-for-bit with the
    reference plan, from BOTH a fresh doc stream and the fused linker
    output, and its size-gated fallback must too."""
    import ray as _ray

    path, spec = corpus_dir
    indexes_ref = _ray.put(build_link_indexes(link_tables(spec)))

    def snapshot(ds):
        rows = ds.to_pandas()
        return {
            row["canon_key"]: (row["doc_id"], row["doc_json"])
            for _, row in rows.iterrows()
        }

    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    base = snapshot(canonicalize(docs, salted=False))
    docs2 = extract_docs(read_documents(path), DEFAULT_CONFIG)
    split = snapshot(canonicalize(docs2, precombine="split", num_partitions=32))
    assert split == base

    docs3 = extract_docs(read_documents(path), DEFAULT_CONFIG)
    linked = link_entities(
        docs3, indexes_ref, concurrency=2, batch_size=64, combine_partitions=32
    )
    base_linked = snapshot(canonicalize(linked, precombine="fused", num_partitions=32))
    docs4 = extract_docs(read_documents(path), DEFAULT_CONFIG)
    linked2 = link_entities(
        docs4, indexes_ref, concurrency=2, batch_size=64, combine_partitions=32
    )
    split_fused = snapshot(
        canonicalize(linked2, precombine="split", num_partitions=32)
    )
    assert split_fused == base_linked

    # dup_key_limit=0 forces the fallback path (full hash-partitioned merge)
    from esmarc_ray.stages.canonicalize import _merge_partition, _split_merge

    docs5 = extract_docs(read_documents(path), DEFAULT_CONFIG)
    live = docs5.filter(
        expr="entity_class != '_error' and entity_class != '_dropped'"
    )
    combined = live.map_batches(
        _merge_partition, batch_format="pyarrow", zero_copy_batch=True
    )
    fallback = snapshot(
        _split_merge(combined, num_partitions=32, has_part=False, dup_key_limit=0)
    )
    assert fallback == base


def test_merge_docs_associative():
    a = ("1", {"@id": "x/1", "preferredName": "A", "sameAs": [{"@id": "s1"}]})
    b = ("2", {"@id": "x/2", "preferredName": "B", "sameAs": [{"@id": "s2"}]})
    c = ("3", {"@id": "x/3", "about": [{"name": "t"}]})
    left = merge_docs([merge_docs([a, b]), c])
    right = merge_docs([a, merge_docs([b, c])])
    direct = merge_docs([a, b, c])
    assert left == right == direct
    assert direct[1]["_merged_from"] == ["1", "2", "3"]


def test_full_pipeline_and_resume(ray_session, corpus_dir, tmp_path):
    path, spec = corpus_dir
    out1 = tmp_path / "run1"
    manifest1 = run_kg_pipeline(
        path, str(out1), link_tables=link_tables(spec), num_shards=3, n_salts=4
    )
    assert manifest1["triples"]["row_count"] > 0
    assert (out1 / "triples" / "shard=00000" / "_SUCCESS").exists()

    # kill one docs shard and resume: output must equal the clean run
    shard_dirs = sorted((out1 / "docs").glob("shard=*"))
    assert len(shard_dirs) == 3
    shutil.rmtree(shard_dirs[1])
    manifest2 = run_kg_pipeline(
        path, str(out1), link_tables=link_tables(spec), num_shards=3, n_salts=4
    )
    statuses = {s["shard"]: s["status"] for s in manifest2["shards"]}
    assert statuses[0] == "skipped(resume)" and statuses[2] == "skipped(resume)"
    assert statuses[1] == "built"
    assert manifest2["triples"]["content_hash"] == manifest1["triples"]["content_hash"]
    assert manifest2["triples"]["row_count"] == manifest1["triples"]["row_count"]

    # partitioned layout by entity class
    classes = {p.name.split("=")[1] for p in (out1 / "triples" / "shard=00000").glob("entity_class=*")}
    assert "resources" in classes and "persons" in classes


def test_jsonld_sink_rerun_does_not_accumulate(ray_session, corpus_dir, tmp_path):
    """Re-running the pipeline with -jsonld into the same prefix must wipe
    the jsonld sink first (LDJ file names are unique per run; a resumed run
    would otherwise double every stream)."""
    path, spec = corpus_dir
    out = tmp_path / "run"
    m1 = run_kg_pipeline(
        path, str(out), link_tables=link_tables(spec), num_shards=2, n_salts=2,
        jsonld=True,
    )
    m2 = run_kg_pipeline(
        path, str(out), link_tables=link_tables(spec), num_shards=2, n_salts=2,
        jsonld=True,
    )
    assert m2["jsonld"]["n_docs"] == m1["jsonld"]["n_docs"]
    n_lines = sum(
        len(f.read_text().splitlines()) for f in (out / "jsonld").glob("*/*.ldj")
    )
    assert n_lines == m2["jsonld"]["n_docs"]


def test_extract_prune_equivalence(ray_session, corpus_dir):
    """Mapping-derived span pruning must not change any extracted doc."""
    path, spec = corpus_dir
    pruned = extract_docs(read_documents(path), DEFAULT_CONFIG, prune=True).to_pandas()
    full = extract_docs(read_documents(path), DEFAULT_CONFIG, prune=False).to_pandas()
    key = ["doc_id", "entity_class"]
    pruned = pruned.sort_values(key).reset_index(drop=True)
    full = full.sort_values(key).reset_index(drop=True)
    assert (pruned["doc_json"] == full["doc_json"]).all()


def test_idfile_read(ray_session, corpus_dir):
    path, spec = corpus_dir
    all_ids = read_documents(path).to_pandas()["doc_id"].tolist()
    wanted = sorted(all_ids)[:5]
    subset = read_documents(path, doc_ids=wanted).to_pandas()
    assert sorted(subset["doc_id"]) == wanted


def test_query_prefilter_pushdown(ray_session, corpus_dir):
    """-query DNF prefilter: correct subset AND scan-level pushdown — the
    read operator alone emits the filtered row count (no downstream Filter
    stage materializes the unfiltered table)."""
    from esmarc_ray.io import compile_query_filter

    path, spec = corpus_dir
    all_ids = sorted(read_documents(path).to_pandas()["doc_id"])
    lo, hi = all_ids[3], all_ids[12]

    ds = read_documents(path, query=[["doc_id", ">=", lo], ["doc_id", "<", hi]])
    got = sorted(ds.to_pandas()["doc_id"])
    assert got == [i for i in all_ids if lo <= i < hi]
    # pushdown evidence: the plan is a bare read — the predicate ran inside
    # the parquet scanner (where row-group statistics prune), not as a
    # post-read Ray Filter operator over the full table
    stats = ds.stats()
    assert "Filter" not in stats
    assert f"{len(got)} rows output" in stats or len(got) == ds.count()

    # disjunction-of-conjunctions + `in` compile too
    expr = compile_query_filter(
        [[["doc_id", "==", lo]], [["doc_id", "in", [hi]]]]
    )
    two = read_documents(path, filter=expr).to_pandas()
    assert sorted(two["doc_id"]) == sorted([lo, hi])

    # query ANDs with doc_ids (reference: query + IDFile compose)
    both = read_documents(
        path, doc_ids=[lo, hi], query=[["doc_id", ">", lo]]
    ).to_pandas()
    assert both["doc_id"].tolist() == [hi]


def test_triple_pr_scorer(ray_session, corpus_dir):
    import pandas as pd
    import ray as _ray

    from esmarc_ray.ops.scoring import triple_pr

    path, spec = corpus_dir
    triples = docs_to_triples(extract_docs(read_documents(path), DEFAULT_CONFIG))
    ours_df = triples.to_pandas()

    # identical sides → P/R 1.0 everywhere
    pr = triple_pr(
        _ray.data.from_pandas(ours_df), _ray.data.from_pandas(ours_df.copy())
    )
    assert (pr["precision"] == 1.0).all() and (pr["recall"] == 1.0).all()

    # drop some reference rows of one predicate → our precision dips there only
    target = "preferredName"
    ref_df = ours_df[~((ours_df["pred"] == target) & (ours_df.index % 2 == 0))]
    pr2 = triple_pr(_ray.data.from_pandas(ours_df), _ray.data.from_pandas(ref_df))
    row = pr2[pr2["pred"] == target].iloc[0]
    assert row["precision"] < 1.0 and row["fp"] > 0
    others = pr2[pr2["pred"] != target]
    assert (others["precision"] == 1.0).all()


def test_canonicalize_sameas_closure(ray_session):
    """A–B share GND X, B–C share GND Y: closure merges all three; the plain
    key merge keeps C separate."""
    import pandas as pd
    import pyarrow as pa
    import ray as _ray

    from esmarc_ray.stages.extract import DOC_SCHEMA

    def doc_row(doc_id, key, gnds):
        return {
            "doc_id": doc_id, "entity_class": "topics", "canon_key": key,
            "doc_json": json.dumps({"@id": f"x/{doc_id}", "preferredName": doc_id}),
            "gnd_ids": gnds, "error": "",
        }

    rows = [
        doc_row("a1", "gnd:X", ["X"]),
        doc_row("b2", "gnd:X", ["X", "Y"]),
        doc_row("c3", "gnd:Y", ["Y"]),
        doc_row("d4", "isil:DE-627:99", []),  # no identifiers: untouched
    ]
    table = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    docs = _ray.data.from_arrow(table)

    from esmarc_ray.stages.canonicalize import canonicalize

    plain = canonicalize(docs, salted=False, num_partitions=8).to_pandas()
    assert len(plain) == 3  # gnd:X merged, gnd:Y separate, isil separate

    closed = canonicalize(docs, salted=False, num_partitions=8, closure=True).to_pandas()
    assert len(closed) == 2
    merged = closed[closed["canon_key"] == "gnd:X"].iloc[0]
    assert json.loads(merged["doc_json"])["_merged_from"] == ["a1", "b2", "c3"]
    assert "isil:DE-627:99" in set(closed["canon_key"])

    # the DISTRIBUTED key-rewrite (alias table past the broadcast limit:
    # co-partitioned join, nothing driver-side) must agree with broadcast
    from esmarc_ray.stages.canonicalize import _rewrite_keys, closure_keys

    mapping = closure_keys(docs, num_partitions=4)
    broadcast = (
        _rewrite_keys(docs, mapping, 4)
        .to_pandas()[["doc_id", "canon_key"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    distributed = (
        _rewrite_keys(docs, mapping, 4, broadcast_limit=0)
        .to_pandas()[["doc_id", "canon_key"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(distributed, broadcast)


def test_link_stage_wikipedia_categories(ray_session, corpus_dir):
    """The 6th enrichment bot: wikipedia sameAs links gain per-language
    category nodes (reference enrichment/wikipedia_categories.py:21-82)."""
    path, spec = corpus_dir
    import ray as _ray

    indexes_ref = _ray.put(build_link_indexes(link_tables(spec)))
    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    linked = link_entities(docs, indexes_ref, concurrency=2, batch_size=64)
    rows = linked.to_pandas()
    cats = []
    for doc_json in rows["doc_json"]:
        if not doc_json:
            continue
        doc = json.loads(doc_json)
        if "category" in doc:
            cats.append(doc["category"])
    assert cats, "no document gained wikipedia categories"
    sample = cats[0]
    cc, value = next(iter(sample.items()))
    node = value[0] if isinstance(value, list) else value
    assert node["sameAs"].startswith(f"https://{cc}.wikipedia.org/wiki/")
    assert "curid=" in node["@id"]
    assert ":" not in node["name"] or not node["name"].startswith(("Category", "Kategorie"))


def test_estimate_salts_sketch(ray_session, corpus_dir):
    """Auto salt factor: >1 on the skewed corpus (head GND entity), == the
    full-pipeline result when plugged into canonicalize."""
    import pandas as pd
    import ray.data

    from esmarc_ray.stages.canonicalize import canonicalize, estimate_salts

    path, spec = corpus_dir
    docs = extract_docs(read_documents(path), DEFAULT_CONFIG)
    salts = estimate_salts(docs, target_parallelism=64)
    assert salts >= 1
    # uniform keys → no salting needed
    uniform = ray.data.from_pandas(
        pd.DataFrame({"canon_key": [f"k{i}" for i in range(2000)],
                      "entity_class": ["persons"] * 2000})
    )
    assert estimate_salts(uniform, target_parallelism=64) == 1
    # auto mode produces the same canonical sets as explicit salting
    auto = canonicalize(docs, n_salts="auto").to_pandas()
    explicit = canonicalize(docs, n_salts=8).to_pandas()
    assert set(auto["canon_key"]) == set(explicit["canon_key"])


def _linker_indexes(wd_rows, wp_rows):
    import pyarrow as pa

    from esmarc_ray.stages.link import build_link_indexes

    empty = {
        "ef_links": pa.table({"gnd_id": pa.array([], pa.string()), "links": pa.array([], pa.list_(pa.struct([("id", pa.string()), ("abbr", pa.string()), ("name", pa.string())])))}),
        "gnd_subjects": pa.table({"gnd_id": pa.array([], pa.string()), "subject_category": pa.array([], pa.list_(pa.string())), "field_of_study": pa.array([], pa.list_(pa.string())), "ddc3": pa.array([], pa.list_(pa.string()))}),
        "geonames": pa.table({"geoname_id": pa.array([], pa.int64()), "name": pa.array([], pa.string()), "alternate_names": pa.array([], pa.list_(pa.string())), "lat": pa.array([], pa.float64()), "lon": pa.array([], pa.float64())}),
    }
    import pyarrow as _pa

    tables = dict(empty)
    tables["wd_xref"] = _pa.Table.from_pylist(wd_rows)
    tables["wp_sites"] = _pa.Table.from_pylist(wp_rows)
    return build_link_indexes(tables)


def _linker_batch(rows):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "entity_class": ["persons"] * len(rows),
            "canon_key": [f"k{i}" for i in range(len(rows))],
            "doc_json": [r[1] for r in rows],
            "gnd_ids": pa.array([r[2] for r in rows], pa.list_(pa.string())),
            "error": [""] * len(rows),
        }
    )


def test_linker_viaf_only_doc_links():
    """A doc identified ONLY by VIAF (no GND) must still resolve its QID —
    reference enrichment/wikidata.py:10-30 matches 10 ext-id prefixes."""
    from esmarc_ray.stages.link import EntityLinker

    indexes = _linker_indexes(
        wd_rows=[{"ext_uri_prefix": "http://viaf.org", "ext_value": "4242", "qid": "Q77"}],
        wp_rows=[{"qid": "Q77", "site": "de", "url": "https://de.wikipedia.org/wiki/Neu", "title": "Neu"}],
    )
    doc = {
        "@id": "http://example.org/p1",
        "sameAs": [
            {
                "@id": "http://viaf.org/viaf/4242",
                "publisher": {"abbr": "VIAF"},
                "isBasedOn": {"@type": "Dataset", "@id": "http://example.org/src"},
            }
        ],
    }
    batch = _linker_batch([("p1", json.dumps(doc, sort_keys=True), [])])
    out = EntityLinker(indexes)(batch)
    assert out.column("n_links_added")[0].as_py() > 0
    enriched = json.loads(out.column("doc_json")[0].as_py())
    ids = [l["@id"] for l in enriched["sameAs"]]
    assert "http://www.wikidata.org/entity/Q77" in ids
    assert "https://de.wikipedia.org/wiki/Neu" in ids
    assert enriched["name"]["de"] == "Neu"


def test_linker_replaces_obsolete_wikipedia_link():
    """A stale wikipedia link whose isBasedOn host is obsolete
    (hub.culturegraph.org) is REPLACED in place, not duplicated —
    reference enrichment/wikipedia.py:25,144-146."""
    from esmarc_ray.stages.link import EntityLinker

    indexes = _linker_indexes(
        wd_rows=[{"ext_uri_prefix": "https://d-nb.info/gnd/", "ext_value": "118", "qid": "Q9"}],
        wp_rows=[{"qid": "Q9", "site": "de", "url": "https://de.wikipedia.org/wiki/Frisch", "title": "Frisch"}],
    )
    doc = {
        "@id": "http://example.org/p2",
        "sameAs": [
            {
                "@id": "https://de.wikipedia.org/wiki/Veraltet",
                "publisher": {"abbr": "WP-de", "preferredName": "Wikipedia"},
                "isBasedOn": {"@type": "Dataset", "@id": "https://hub.culturegraph.org/resource/X"},
            }
        ],
    }
    batch = _linker_batch([("p2", json.dumps(doc, sort_keys=True), ["118"])])
    out = EntityLinker(indexes)(batch)
    enriched = json.loads(out.column("doc_json")[0].as_py())
    wp_links = [l for l in enriched["sameAs"] if "de.wikipedia.org" in l["@id"]]
    assert len(wp_links) == 1, "obsolete link must be replaced, not duplicated"
    assert wp_links[0]["@id"] == "https://de.wikipedia.org/wiki/Frisch"


def test_linker_passthrough_keeps_original_serialization():
    """Unenrichable docs skip the JSON round-trip: the output string is the
    SAME OBJECT as the input (candidate gate + no-change fast path)."""
    from esmarc_ray.stages.link import EntityLinker

    indexes = _linker_indexes(wd_rows=[], wp_rows=[])
    raw = json.dumps({"@id": "http://example.org/p3", "preferredName": "X"}, sort_keys=True)
    batch = _linker_batch([("p3", raw, [])])
    out = EntityLinker(indexes)(batch)
    assert out.column("n_links_added")[0].as_py() == 0
    assert out.column("doc_json")[0].as_py() == raw


def test_curate_documents_reasons_and_dedup(ray_session):
    """Full curation pipeline: gate reasons partition the corpus exactly,
    exact + near dups drop, clean docs survive."""
    import pandas as pd
    import ray.data

    from esmarc_ray.pipelines.curate import curate_documents

    base = (
        "the quick brown fox jumps over the lazy dog and then it runs far "
        "away to the old wooden house near the river where animals live"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # exact dup
        {"doc_id": 3, "text": base.replace("river", "creek")},  # near dup
        {"doc_id": 4, "text": "short"},  # too_short
        {"doc_id": 5, "text": "!!! ??? *** " * 12},  # punct
        {"doc_id": 6, "text": "the benchmark question is what color is the "
                              "sky at noon today my friends"},  # contaminated
        {"doc_id": 7, "text": "a completely different clean document about "
                              "the weather and the ships that sail across "
                              "the wide sea when the wind is strong"},
    ]
    docs = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    kept, annotated, report = curate_documents(
        docs,
        benchmark_texts=[rows[5]["text"]],
        minhash_threshold=0.7,
    )
    ann = annotated.to_pandas().set_index("doc_id")["drop_reason"]
    assert ann[4] == "too_short" and ann[5] == "punct" and ann[6] == "contaminated"
    assert ann[1] == "" and ann[7] == ""
    assert report["n"].sum() == len(rows)  # reasons partition the corpus
    # gates pass docs 1,2,3,7 — dedup (which removes 2 and 3) runs AFTER the
    # report, so "kept" is an upper bound on the final row count
    assert int(report.loc[report["drop_reason"] == "kept", "n"].iloc[0]) == 4
    assert sorted(kept.to_pandas()["doc_id"]) == [1, 7]


def test_curate_documents_exact_variant_matches_sql(ray_session):
    """near_dedup='jaccard' end to end equals the recursive-CTE DuckDB
    formulation (gates + exact dedup + exact-Jaccard closure)."""
    import importlib.util

    import duckdb
    import ray.data

    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    got = mod.queries()["curated_exact_docs"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = con.execute(mod.oracle_sql()["curated_exact_docs"]).df()
    assert len(got) > 0 and got.reset_index(drop=True).equals(exp)


def test_unionfind_drop_matches_chain_closure(ray_session):
    """Chain graph a-b-c-d: union-find keeps only the minimum of the chain —
    the same closure the recursive CTE computes (the long-diameter case that
    made round-based label propagation pathological)."""
    from esmarc_ray.ops.dedup import _unionfind_drop_ids

    drops = _unionfind_drop_ids([("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")])
    assert drops == {"b", "c", "d", "y"}


def test_curate_documents_checkpoint_dir_reuse(ray_session, tmp_path):
    """A reused checkpoint dir is wiped first: parquet file names are unique
    per run, so stale files would double-count every row."""
    import pandas as pd
    import ray.data

    from esmarc_ray.pipelines.curate import curate_documents

    text = (
        "a completely different clean document about the weather and the "
        "ships that sail across the wide sea when the wind is strong"
    )
    docs = ray.data.from_pandas(
        pd.DataFrame([{"doc_id": 1, "text": text}, {"doc_id": 2, "text": "short"}])
    )
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):  # second run over the same dir must not double-count
        kept, annotated, report = curate_documents(docs, checkpoint_dir=ckpt)
        assert int(report["n"].sum()) == 2
        assert annotated.count() == 2


def test_er_pipeline_planted_duplicates(ray_session):
    """Blocked ER end-to-end: planted fuzzy duplicates cluster together
    (P == R == 1.0 on the planted truth), singletons stay alone."""
    import pandas as pd
    import ray.data

    from esmarc_ray.pipelines.er import resolve_entities

    rows = pd.DataFrame(
        {
            "id": [f"r{i}" for i in range(9)],
            "name": [
                "johann sebastian bach",
                "johann sebastien bach",      # typo dup of 0
                "johann sebastian bach jr",   # near dup of 0
                "wolfgang amadeus mozart",
                "wolfgang amadeus mozartt",   # typo dup of 3
                "ludwig van beethoven",
                "clara schumann",
                "robert schumann",            # NOT a dup of clara (JW < thr)
                "antonin dvorak",
            ],
        }
    )
    out = resolve_entities(
        ray.data.from_pandas(rows), id_col="id", text_col="name",
        t1=0.8, t2=0.9, jw_threshold=0.9, num_partitions=4,
    ).to_pandas()

    canon = dict(zip(out["id"], out["canon_id"]))
    assert canon["r0"] == canon["r1"] == canon["r2"]
    assert canon["r3"] == canon["r4"]
    assert canon["r0"] != canon["r3"]
    assert canon["r6"] != canon["r7"]
    # singletons resolve to themselves
    for rid in ["r5", "r6", "r7", "r8"]:
        assert canon[rid] == rid
    sizes = dict(zip(out["id"], out["cluster_size"]))
    assert sizes["r0"] == 3 and sizes["r3"] == 2 and sizes["r8"] == 1


def test_bucketed_materialize_resume(ray_session, corpus_dir, tmp_path):
    """Per-bucket resumable wide-phase sink: a clean 4-bucket build, one
    bucket destroyed, a resumed run must rebuild EXACTLY that bucket (the
    others skip via their markers) and reproduce every per-bucket content
    hash and row count bit-for-bit."""
    import json as _json
    import shutil

    from esmarc_ray.stages.extract import docs_to_triples
    from esmarc_ray.stages.materialize import materialize_buckets

    path, spec = corpus_dir

    def triples():
        return docs_to_triples(
            extract_docs(read_documents(path), DEFAULT_CONFIG)
        )

    out = tmp_path / "buckets"
    clean = materialize_buckets(
        triples(), out, num_buckets=4, resume=False, inputs=["t"]
    )
    assert sorted(clean["built"]) == [0, 1, 2, 3]
    clean_manifests = {
        k: (m["row_count"], m["content_hash"])
        for k, m in clean["buckets"].items()
    }
    total = sum(rc for rc, _ in clean_manifests.values())
    assert total > 0

    victim = next(k for k in range(4) if clean_manifests[str(k)][0] > 0)
    shutil.rmtree(out / f"bucket={victim}")
    resumed = materialize_buckets(
        triples(), out, num_buckets=4, resume=True, inputs=["t"]
    )
    assert resumed["built"] == [victim]
    assert sorted(resumed["skipped"]) == sorted(set(range(4)) - {victim})
    for k in range(4):
        m = _json.loads((out / f"bucket={k}" / "_manifest.json").read_text())
        assert (m["row_count"], m["content_hash"]) == clean_manifests[str(k)], k

    # read-back equals a fresh full build row-for-row (hive columns ride)
    import ray as _ray

    back = _ray.data.read_parquet(str(out)).count()
    assert back == total


def test_materialize_shard_keeps_null_partition_rows(ray_session, tmp_path):
    """Regression: a null partition-column value must not be silently
    dropped by the write-path sink (pc.equal(col, null) is all-null and
    filter() treats null as false) — it lands in the hive default
    partition and counts in the manifest."""
    import pandas as pd
    import ray.data

    from esmarc_ray.stages.materialize import materialize_shard

    triples = ray.data.from_pandas(pd.DataFrame({
        "entity_class": ["resources", None, "persons"],
        "subj": ["a", "b", "c"],
        "pred": ["p", "p", "p"],
        "obj": ["1", "2", "3"],
    }))
    manifest = materialize_shard(
        triples, tmp_path / "shard=00000", sort=True
    )
    assert manifest["row_count"] == 3
    assert sum(manifest["rows_per_class"].values()) == 3
    null_dir = (
        tmp_path / "shard=00000" / "entity_class=__HIVE_DEFAULT_PARTITION__"
    )
    assert any(null_dir.rglob("*.parquet"))
    back = ray.data.read_parquet(str(tmp_path / "shard=00000")).to_pandas()
    assert len(back) == 3 and set(back["subj"]) == {"a", "b", "c"}
