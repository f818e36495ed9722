"""Entity-link scoring stage: an actor pool holding sharded lookup indexes.

The reference chains six single-process "enrichment bots" over stdin/stdout,
each doing per-record lookups against external stores (reference
enrichment/entityfacts.py, wikidata.py, wikipedia.py, geonames.py,
gnd_sachgruppen.py — see SURVEY.md §2.4).  Here the joins run inside one
``map_batches`` actor pool:

* the small side (GND→links, extid→QID, QID→sitelinks, GND→subjects, and a
  geohash-bucketed geonames index) is built ONCE per actor in ``__init__``
  from ``ray.put`` object refs — broadcast, never re-shipped per batch;
* each batch is enriched in place (doc_json rewritten), with an
  ``n_links_added`` column for link-recall scoring.

Link semantics mirror the bots:
* entityfacts: add sameAs links for a resolved GND id, keep only when the
  link set actually grew (entityfacts.py:109-154);
* wikidata: ANY of the reference's 10 identifier-URI prefixes (VIAF / GND /
  ISNI / LoC / DDB / BnF / geonames / filmportal / ORCID / SWB) resolves a
  QID appended as a wikidata sameAs (wikidata.py:10-30,33-80);
* wikipedia: QID → per-language sitelinks + multilingual names, with stale
  links from obsolete sources (hub.culturegraph.org) replaced in place
  (wikipedia.py:25,68-159);
* wikipedia_categories: wikipedia sameAs link → per-language category nodes
  under doc["category"][cc] (wikipedia_categories.py:21-82);
* gnd_sachgruppen: GND → subject categories via the 2-hop fieldOfStudy→DDC
  resolution (gnd_sachgruppen.py:39-84);
* geonames: lat/lon within ~0.1 km AND name-substring match
  (geonames.py:46-76) — the one non-hash join, served from a geohash-style
  bucket index.
"""

from __future__ import annotations

import json
import math
from typing import Any

import pyarrow as pa
import ray
import ray.data


def _bucket(lat: float, lon: float) -> tuple[int, int]:
    """~0.01° grid cell (~1.1 km) — candidate bucket for the geo join."""
    return (int(lat * 100), int(lon * 100))


# identifier-URI prefix → value delimiter, mirroring the reference's wikidata
# property table (enrichment/wikidata.py:10-30): any sameAs id matching one of
# these prefixes can resolve a QID, not just the GND id
_WD_EXT_PREFIXES = {
    "http://viaf.org": "/",
    "https://d-nb.info/gnd": "/",
    "http://isni.org": "/",
    "http://id.loc.gov": "/",
    "https://deutsche-digitale-bibliothek.de": "/",
    "http://catalogue.bnf.fr/ark": "/cb",
    "http://geonames.org": "/",
    "http://filmportal.de/person": "/",
    "http://orcid.org": "/",
    "http://swb.bsz-bw.de/DB=2.1/PPNSET?PPN=": "=",
}

# data sources whose stale wikipedia links get REPLACED when wikidata serves a
# fresh sitelink (reference enrichment/wikipedia.py:25,144-146)
_OBSOLETE_ISBASEDON_HOSTS = ("hub.culturegraph.org",)


def _norm_prefix(prefix: str) -> str:
    return prefix.rstrip("/=")


def build_link_indexes(tables: dict[str, pa.Table]) -> dict[str, Any]:
    """Turn the raw lookup tables into hash/bucket indexes (driver side, once)."""
    ef = {row["gnd_id"]: row["links"] for row in tables["ef_links"].to_pylist()}
    wd = {
        (_norm_prefix(row["ext_uri_prefix"]), row["ext_value"]): row["qid"]
        for row in tables["wd_xref"].to_pylist()
    }
    wp: dict[str, list] = {}
    for row in tables["wp_sites"].to_pylist():
        wp.setdefault(row["qid"], []).append(row)
    subjects = {row["gnd_id"]: row for row in tables["gnd_subjects"].to_pylist()}
    cats = {
        (row["cc"], row["article_title"]): row["pages"]
        for row in tables.get("wp_categories", pa.table({"cc": [], "article_title": [], "pages": []})).to_pylist()
    }
    geo: dict[tuple[int, int], list] = {}
    for row in tables["geonames"].to_pylist():
        geo.setdefault(_bucket(row["lat"], row["lon"]), []).append(row)
    return {"ef": ef, "wd": wd, "wp": wp, "subjects": subjects, "geo": geo, "cats": cats}


def _haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    radius = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * radius * math.asin(math.sqrt(a))


class EntityLinker:
    """Actor-pool callable: enrich entity docs against the broadcast indexes.

    ``combine_partitions`` (optional) fuses the canonicalize pre-combine step
    into this actor: after linking, the batch drops error/dropped rows, runs
    the batch-local associative merge, and gains the hash-partition ``part``
    column — so the canonicalize shuffle consumes the actor output directly.
    Ray only fuses map stages INTO an actor pool, never after one, so a
    separate task-pool combine stage would run on whatever CPUs the pool
    leaves free (measured: 47 s of combine CPU trailing on ~2 CPUs at 32)
    and pay one extra full object-store round-trip of the doc payload.
    """

    def __init__(
        self,
        indexes: dict[str, Any] | ray.ObjectRef,
        combine_partitions: int | None = None,
    ):
        if isinstance(indexes, ray.ObjectRef):  # pragma: no cover - resolved by Ray
            indexes = ray.get(indexes)
        self._combine_partitions = combine_partitions
        self._ef = indexes["ef"]
        self._wd = indexes["wd"]
        self._wp = indexes["wp"]
        self._subjects = indexes["subjects"]
        self._geo = indexes["geo"]
        self._cats = indexes.get("cats", {})
        # candidate gate: a doc with no GND id can only be enriched if its
        # raw JSON mentions a geo node, a wikipedia link, or one of the
        # wikidata ext-id prefixes — one compiled scan beats a parse+dump
        # round-trip for the (majority) unenrichable docs
        import re

        markers = ['"geo"', "wikipedia"] + list(_WD_EXT_PREFIXES)
        self._gate = re.compile("|".join(re.escape(m) for m in markers))

    # -- per-doc link steps ---------------------------------------------------

    def _entityfacts(self, doc: dict, gnd_ids: list[str]) -> int:
        added = 0
        same_as = doc.get("sameAs")
        if same_as is None:
            same_as = []
        if isinstance(same_as, dict):
            same_as = [same_as]
        known = {link.get("@id") for link in same_as if isinstance(link, dict)}
        for gnd_id in gnd_ids:
            for link in self._ef.get(gnd_id, []):
                if link["id"] not in known:
                    same_as.append(
                        {
                            "@id": link["id"],
                            "publisher": {"abbr": link["abbr"], "preferredName": link["name"]},
                            "isBasedOn": {"@type": "Dataset", "@id": doc.get("isBasedOn", "")},
                        }
                    )
                    known.add(link["id"])
                    added += 1
        if added:
            doc["sameAs"] = same_as
        return added

    def _ext_id_pairs(self, doc: dict, gnd_ids: list[str]) -> list[tuple[str, str]]:
        """All (normalized prefix, value) identifier pairs the doc carries:
        its GND ids plus every sameAs id matching one of the reference's 10
        wikidata property prefixes (enrichment/wikidata.py:33-56)."""
        pairs = [("https://d-nb.info/gnd", g) for g in gnd_ids]
        same_as = doc.get("sameAs") or []
        if isinstance(same_as, dict):
            same_as = [same_as]
        for link in same_as:
            uri = link.get("@id") if isinstance(link, dict) else (
                link if isinstance(link, str) else None
            )
            if not uri:
                continue
            for prefix, delim in _WD_EXT_PREFIXES.items():
                if uri.startswith(prefix):
                    pairs.append((_norm_prefix(prefix), uri.split(delim)[-1]))
                    break
        return pairs

    def _wikidata_wikipedia(self, doc: dict, gnd_ids: list[str]) -> int:
        from urllib.parse import urlparse

        added = 0
        qids: list[str] = []
        seen: set = set()
        for pair in self._ext_id_pairs(doc, gnd_ids):
            if pair in seen:
                continue
            seen.add(pair)
            qid = self._wd.get(pair)
            if qid and qid not in qids:
                qids.append(qid)
        for qid in qids:
            wd_uri = f"http://www.wikidata.org/entity/{qid}"
            same_as = doc.setdefault("sameAs", [])
            if isinstance(same_as, dict):
                same_as = [same_as]
                doc["sameAs"] = same_as
            if all(link.get("@id") != wd_uri for link in same_as if isinstance(link, dict)):
                same_as.append(
                    {
                        "@id": wd_uri,
                        "publisher": {"abbr": "WIKIDATA", "preferredName": "Wikidata"},
                        "isBasedOn": {"@type": "Dataset", "@id": doc.get("isBasedOn", "")},
                    }
                )
                added += 1
            # per-publisher-abbr position map of the existing sameAs links
            # (reference wikipedia.py:48-66 build_abbrevs): lets a stale link
            # from an obsolete source be REPLACED in place
            abbrevs: dict[str, dict] = {}
            for pos, link in enumerate(same_as):
                if not isinstance(link, dict):
                    continue
                abbr = (link.get("publisher") or {}).get("abbr")
                if not abbr:
                    continue
                based = (link.get("isBasedOn") or {}).get("@id") or ""
                abbrevs[abbr] = {"host": urlparse(based).hostname or "", "pos": pos}
            for site in self._wp.get(qid, []):
                abbr = f"WP-{site['site']}"
                new_link = {
                    "@id": site["url"],
                    "publisher": {"abbr": abbr, "preferredName": "Wikipedia"},
                    "isBasedOn": {"@type": "Dataset", "@id": wd_uri},
                }
                if abbr not in abbrevs:
                    same_as.append(new_link)
                    abbrevs[abbr] = {"host": "www.wikidata.org", "pos": len(same_as) - 1}
                    added += 1
                elif abbrevs[abbr]["host"] in _OBSOLETE_ISBASEDON_HOSTS:
                    # stale source (e.g. hub.culturegraph.org): update in place
                    # (reference wikipedia.py:144-146)
                    same_as[abbrevs[abbr]["pos"]] = new_link
                    abbrevs[abbr]["host"] = "www.wikidata.org"
                    added += 1
                # multilingual name enrichment (reference wikipedia.py:148-157)
                doc.setdefault("name", {})
                if isinstance(doc["name"], dict) and site["site"] not in doc["name"]:
                    doc["name"][site["site"]] = site["title"]
                    added += 1
        return added

    def _wp_categories(self, doc: dict) -> int:
        """Category enrichment from the doc's wikipedia sameAs links (reference
        enrichment/wikipedia_categories.py:21-82): per country code, merge
        {@id: …?curid=<page>, sameAs: <category page>, name: <after colon>}
        nodes under doc["category"][cc] with litter-style dedup."""
        from urllib.parse import unquote

        from esmarc_ray.values import merge_value

        same_as = doc.get("sameAs") or []
        if isinstance(same_as, dict):
            same_as = [same_as]
        added = 0
        for link in same_as:
            uri = link.get("@id") if isinstance(link, dict) else None
            if not uri or "wikipedia" not in uri:
                continue
            cc = uri.split("/")[2].split(".")[0]
            title = unquote(uri.split("/")[-1])
            pages = self._cats.get((cc, title))
            if not pages:
                continue
            base = f"https://{cc}.wikipedia.org/wiki/"
            bucket = doc.setdefault("category", {})
            for page in pages:
                obj = {
                    "@id": base + f"?curid={page['page_id']}",
                    "sameAs": base + page["title"].replace(" ", "_"),
                    "name": ":".join(page["title"].split(":")[1:]),
                }
                current = bucket.get(cc)
                known = current if isinstance(current, list) else ([current] if current else [])
                if obj not in known:
                    added += 1
                bucket[cc] = merge_value(current, obj)
        return added

    def _gnd_subjects(self, doc: dict, gnd_ids: list[str]) -> int:
        added = 0
        for gnd_id in gnd_ids:
            entry = self._subjects.get(gnd_id)
            if not entry:
                continue
            about = doc.setdefault("about", [])
            if isinstance(about, dict):
                about = [about]
                doc["about"] = about
            for category, ddc in zip(entry["subject_category"], entry["ddc3"]):
                node = {
                    "name": category,
                    "identifier": {"@type": "PropertyValue", "propertyID": "DDC", "value": ddc},
                }
                if node not in about:
                    about.append(node)
                    added += 1
        return added

    def _geonames(self, doc: dict) -> int:
        geo = doc.get("geo")
        if not isinstance(geo, dict) or "latitude" not in geo or "longitude" not in geo:
            return 0
        try:
            lat, lon = float(geo["latitude"]), float(geo["longitude"])
        except (TypeError, ValueError):
            return 0
        name = doc.get("preferredName") or ""
        cell = _bucket(lat, lon)
        added = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for row in self._geo.get((cell[0] + dx, cell[1] + dy), []):
                    if _haversine_km(lat, lon, row["lat"], row["lon"]) > 0.1:
                        continue
                    if name and name not in row["name"] and row["name"] not in name:
                        continue
                    uri = f"https://sws.geonames.org/{row['geoname_id']}/"
                    same_as = doc.setdefault("sameAs", [])
                    if isinstance(same_as, dict):
                        same_as = [same_as]
                        doc["sameAs"] = same_as
                    if all(link.get("@id") != uri for link in same_as if isinstance(link, dict)):
                        same_as.append(
                            {
                                "@id": uri,
                                "publisher": {"abbr": "GEONAMES", "preferredName": "GeoNames"},
                                "isBasedOn": {"@type": "Dataset", "@id": doc.get("isBasedOn", "")},
                            }
                        )
                        added += 1
        return added

    # -- batch entry ------------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_jsons = batch.column("doc_json").to_pylist()
        gnd_lists = batch.column("gnd_ids").to_pylist()
        classes = batch.column("entity_class").to_pylist()
        out_json: list[str] = []
        n_added: list[int] = []
        for doc_json, gnd_ids, entity in zip(doc_jsons, gnd_lists, classes):
            if entity in ("_error", "_dropped") or not doc_json:
                out_json.append(doc_json)
                n_added.append(0)
                continue
            if not gnd_ids and not self._gate.search(doc_json):
                # provably unenrichable: skip the JSON round-trip entirely
                out_json.append(doc_json)
                n_added.append(0)
                continue
            doc = json.loads(doc_json)
            added = self._entityfacts(doc, gnd_ids or [])
            added += self._wikidata_wikipedia(doc, gnd_ids or [])
            added += self._wp_categories(doc)
            added += self._gnd_subjects(doc, gnd_ids or [])
            added += self._geonames(doc)
            # unchanged docs keep their original serialization — the dump is
            # a measurable cost and byte-identity helps downstream dedup
            out_json.append(
                json.dumps(doc, sort_keys=True, ensure_ascii=False) if added else doc_json
            )
            n_added.append(added)
        table = batch.set_column(
            batch.schema.get_field_index("doc_json"), "doc_json", pa.array(out_json, pa.string())
        )
        table = table.append_column("n_links_added", pa.array(n_added, pa.int32()))
        if self._combine_partitions is None:
            return table
        from esmarc_ray.stages.canonicalize import (
            _make_add_part,
            _merge_partition,
            _pack_compress,
        )

        import pyarrow.compute as pc

        live = table.filter(
            pc.invert(pc.is_in(table.column("entity_class"), value_set=pa.array(["_error", "_dropped"])))
        )
        # pack + compress the doc payload for the canonicalize exchange:
        # one zlib super-row per destination partition crosses the
        # all-to-all next, and the reducer (_merge_partition) unpacks
        # transparently
        return _pack_compress(
            _make_add_part(self._combine_partitions, None)(_merge_partition(live))
        )


def link_entities(
    docs: ray.data.Dataset,
    indexes_ref: "ray.ObjectRef | dict",
    *,
    concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int = 1024,
    num_cpus: float = 1,
    combine_partitions: int | None = None,
) -> ray.data.Dataset:
    """Run the EntityLinker actor pool over the entity-doc dataset.

    ``indexes_ref`` should be ``ray.put(build_link_indexes(tables))`` — one
    object-store copy, zero per-batch shipping.  ``combine_partitions``
    additionally runs the canonicalize pre-combine inside the pool (see
    :class:`EntityLinker`); pair it with ``canonicalize(...,
    precombine="fused")``.
    """
    return docs.map_batches(
        EntityLinker,
        fn_constructor_args=(indexes_ref, combine_partitions),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )
