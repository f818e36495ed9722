"""Extract the reference's declared output schema into packaged JSON data.

The reference ships one Elasticsearch index mapping per entity class
(/root/reference/mapping/{persons,geo,organizations,resources,topics,
works,events}.json) typing every emitted subfield — e.g. persons.json:53-77
declares ``birthDate.@value`` as ``date``.  This tool flattens those
declarations into ``esmarc_ray/data/output_schema.json``:

    {entity_class: {predicate: {subfield: es_type}}}

This is the reference's own *data* (type declarations), extracted so the
engine can enforce the declared output contract without reading the
reference at runtime — same provenance pattern as extract_lookups.py.

Run from the repo root:  python tools/extract_output_schema.py
"""

from __future__ import annotations

import json
import pathlib

REF_MAPPING_DIR = pathlib.Path("/root/reference/mapping")
OUT = pathlib.Path(__file__).resolve().parent.parent / "esmarc_ray" / "data" / "output_schema.json"


def flatten(props: dict, prefix: list[str], out: dict[str, str]) -> None:
    for name, spec in props.items():
        path = prefix + [name]
        if "type" in spec:
            out[".".join(path)] = spec["type"]
        if "properties" in spec:
            flatten(spec["properties"], path, out)


def main() -> None:
    schema: dict[str, dict[str, dict[str, str]]] = {}
    for path in sorted(REF_MAPPING_DIR.glob("*.json")):
        entity_class = path.stem
        leaves: dict[str, str] = {}
        flatten(json.loads(path.read_text())["mappings"]["properties"], [], leaves)
        per_pred: dict[str, dict[str, str]] = {}
        for dotted, es_type in leaves.items():
            pred, _, subfield = dotted.partition(".")
            per_pred.setdefault(pred, {})[subfield or "@value"] = es_type
        schema[entity_class] = per_pred
    OUT.write_text(json.dumps(schema, indent=1, sort_keys=True) + "\n")
    n = sum(len(v) for c in schema.values() for v in c.values())
    print(f"wrote {OUT} ({len(schema)} classes, {n} typed subfields)")


if __name__ == "__main__":
    main()
