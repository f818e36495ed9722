"""Generate full-record parity goldens by executing the READ-ONLY reference
code at /root/reference against its own 17 test records.

The reference's two external deps (es2json, dateparser) are shimmed from
tools/refshim — the date shim delegates to the engine's deterministic parser
so both sides agree on dates; es2json semantics are reimplemented in
esmarc_ray.values.  Output: tests/fixtures/goldens_full/<id>.json holding
``{entity_class: jsonld_doc}`` (or null for records the reference drops).

Run from the repo root: ``python3 tools/make_goldens.py``
"""

from __future__ import annotations

import importlib
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
OUT = REPO / "tests" / "fixtures" / "goldens_full"


def main() -> None:
    sys.path.insert(0, str(REPO))
    # install shims under their expected import names
    import tools.refshim.es2json as es2json_shim
    import tools.refshim.dateparser as dateparser_shim

    sys.modules["es2json"] = es2json_shim
    sys.modules["dateparser"] = dateparser_shim
    sys.path.insert(0, str(REFERENCE))

    from esmarc_ray.config import DEFAULT_CONFIG

    esmarc_pkg = importlib.import_module("esmarc.esmarc")
    processing = importlib.import_module("esmarc.processing")
    globals_mod = importlib.import_module("esmarc.globals")
    globals_mod.initialize()
    globals_mod.base_id = DEFAULT_CONFIG.base_id
    globals_mod.target_id = DEFAULT_CONFIG.target_id

    OUT.mkdir(parents=True, exist_ok=True)
    dropped = []
    for fixture in sorted((REFERENCE / "tests" / "in").iterdir()):
        record = json.loads(fixture.read_text())
        try:
            result = processing.process_line(
                record, DEFAULT_CONFIG.source_index, esmarc_pkg.entities
            )
        except Exception as exc:  # the reference drops such records (worker catch-all)
            result = None
            dropped.append((fixture.name, repr(exc)))
        (OUT / f"{fixture.name}.json").write_text(
            json.dumps(result, sort_keys=True, ensure_ascii=False, indent=1)
        )
    print(f"wrote {len(list(OUT.iterdir()))} goldens to {OUT}")
    for name, err in dropped:
        print(f"  dropped (reference raised): {name}: {err}")


if __name__ == "__main__":
    main()
