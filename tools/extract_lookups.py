"""One-shot extraction of the reference's lookup *data* tables to JSON.

The reference keeps ~3.1k LoC of pure data dicts under
esmarc/lookup_tables/*.py (ISIL→URI prefixes, MARC relator roles, ISO-639-2
labels, collection codes, ...).  These tables are mapping *data* — the WHAT,
not the HOW — and the engine needs them verbatim for output parity.  This
script loads each module (they are dependency-free) and writes a single
``esmarc_ray/data/lookups.json`` consumed by ``esmarc_ray.lookups``.

Run once: ``python tools/extract_lookups.py``
"""

from __future__ import annotations

import importlib.util
import json
import pathlib

REFERENCE = pathlib.Path("/root/reference/esmarc/lookup_tables")
OUT = pathlib.Path(__file__).resolve().parent.parent / "esmarc_ray" / "data" / "lookups.json"

# module file -> {json key: dict name in module}
WANTED = {
    "entities.py": {
        "entity_by_code": "map_entities",
        "schema_type_by_code": "map_types",
        "mention_type_by_code": "map_types_mentions",
        "mention_field_map": "map_fields",
    },
    "sameAs.py": {"isil_authorities": "lookup_sameAs"},
    "identifiers.py": {"identifier_uri_prefixes": "lookup_identifiers"},
    "classifications.py": {"classification_schemes": "classifications"},
    "collections.py": {"ssg_fid_labels": "lookup_ssg_fid", "collection_labels": "lookup_coll"},
    "footnotes.py": {"footnote_types": "footnotes_lookups"},
    "language.py": {
        "language_labels": "language_iso_label_lookups",
        "k10plus_to_iso": "language_k10plus_to_iso_lookups",
    },
    "publisher.py": {"place_roles": "places"},
    "relatedTo.py": {"relation_by_code": "marc2relation"},
    "roles.py": {"role_labels_de": "rolemapping", "role_labels_en": "rolemapping_en"},
}


def load_module(path: pathlib.Path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def main() -> None:
    out: dict[str, dict] = {}
    for filename, mapping in WANTED.items():
        module = load_module(REFERENCE / filename)
        for json_key, attr in mapping.items():
            out[json_key] = getattr(module, attr)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(out, ensure_ascii=False, indent=1, sort_keys=True))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(out)} tables)")


if __name__ == "__main__":
    main()
