"""Per-bot enrichment CLIs — the reference's stdin/stdout chaining surface.

The reference ships each enrichment bot as a standalone process reading
LDJ records from stdin and printing enriched records, with ``-pipeline``
passing every record through so bots chain via shell pipes (reference
enrichment/entityfacts.py:193-256, wikidata.py:83-146).  A user migrating
existing shell pipelines gets the same drop-in here::

    cat docs.ldj \
      | python -m esmarc_ray.enrich entityfacts -stdin -pipeline -tables T \
      | python -m esmarc_ray.enrich wikidata    -stdin -pipeline -tables T \
      | python -m esmarc_ray.enrich geonames    -stdin -pipeline -tables T

Each bot is a thin wrapper over the SAME per-doc link steps the fused
:class:`esmarc_ray.stages.link.EntityLinker` actor pool runs (chaining all
five bots reproduces the fused linker's output byte-for-byte — gated by
tests/test_cli.py::test_enrich_bot_chain_matches_fused_linker).  Bot names
mirror the reference scripts; ``wikidata`` covers the reference's
wikidata.py→wikipedia.py pair, which this engine fuses into one step
(qid lookup + sitelink replacement).

No Ray session is created — the bots run single-process like the
reference's.  Index tables come from ``-tables <dir>`` (parquet files named
ef_links/wd_xref/wp_sites/gnd_subjects/wp_categories/geonames) or
``-synthetic N[:SEED]`` (the deterministic test corpus tables).
"""

from __future__ import annotations

import argparse
import json
import sys

#: bot name → (EntityLinker method name, takes gnd_ids)
BOTS: dict[str, tuple[str, bool]] = {
    "entityfacts": ("_entityfacts", True),
    "wikidata": ("_wikidata_wikipedia", True),
    "wikipedia_categories": ("_wp_categories", False),
    "gnd_sachgruppen": ("_gnd_subjects", True),
    "geonames": ("_geonames", False),
}

_TABLE_NAMES = (
    "ef_links", "wd_xref", "wp_sites", "gnd_subjects", "wp_categories", "geonames",
)


def _make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m esmarc_ray.enrich",
        description=__doc__.splitlines()[0],
    )
    p.add_argument("bot", choices=sorted(BOTS), help="enrichment bot to run")
    p.add_argument(
        "-stdin", action="store_true",
        help="read LDJ records from stdin (the only supported source; the "
        "flag exists for reference CLI name-compatibility)",
    )
    p.add_argument(
        "-pipeline", action="store_true",
        help="print every record, enriched or not, so bots chain via pipes",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument(
        "-tables", type=str,
        help="directory of index parquet tables (%s)" % ", ".join(_TABLE_NAMES),
    )
    src.add_argument(
        "-synthetic", type=str, metavar="N[:SEED]",
        help="use the deterministic synthetic link tables sized for N docs",
    )
    return p


def _load_tables(args) -> dict:
    if args.synthetic:
        from esmarc_ray.corpus import CorpusSpec, link_tables

        n, _, seed = args.synthetic.partition(":")
        return link_tables(CorpusSpec(n_docs=int(n), seed=int(seed or 42)))
    import pathlib

    import pyarrow.parquet as pq

    base = pathlib.Path(args.tables)
    tables = {}
    for name in _TABLE_NAMES:
        path = base / f"{name}.parquet"
        if path.exists():
            tables[name] = pq.read_table(str(path))
    missing = {"ef_links", "wd_xref", "wp_sites", "gnd_subjects", "geonames"} - set(tables)
    if missing:
        raise SystemExit(f"-tables {base}: missing {sorted(missing)}")
    return tables


def run(argv: list[str] | None = None) -> None:
    from esmarc_ray.stages.extract import doc_gnd_ids
    from esmarc_ray.stages.link import EntityLinker, build_link_indexes

    args = _make_parser().parse_args(argv)
    linker = EntityLinker(build_link_indexes(_load_tables(args)))
    step = getattr(linker, BOTS[args.bot][0])
    takes_gnd = BOTS[args.bot][1]

    out = sys.stdout
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        doc = json.loads(line)
        added = step(doc, doc_gnd_ids(doc)) if takes_gnd else step(doc)
        if added:
            # enriched docs use the house canonical serialization (the same
            # one the fused linker emits); unchanged docs keep their original
            # bytes (byte-identity helps downstream dedup)
            out.write(json.dumps(doc, sort_keys=True, ensure_ascii=False))
            out.write("\n")
        elif args.pipeline:
            out.write(line)
            out.write("\n")


if __name__ == "__main__":
    run()
