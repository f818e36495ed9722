"""Synthetic-corpus parity: engine vs live-executed reference on all 7
entity classes (the 17 real fixtures are all resources; the synthetic corpus
exercises persons/topics/organizations/geo/works/events too).

The read-only reference at /root/reference is imported with shimmed deps
(tools/refshim) and run record-by-record next to the engine's map_record.
"""

from __future__ import annotations

import json
import sys

import pytest

from esmarc_ray.codec import decode_spans, encode_record
from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.corpus import CorpusSpec, generate_records
from esmarc_ray.mapping import map_record
from tests.test_parity import normalize

N_DOCS = 130  # ≥ one full class-mix cycle times ten


@pytest.fixture(scope="module")
def reference_runtime():
    import tools.refshim.es2json as es2json_shim
    import tools.refshim.dateparser as dateparser_shim

    sys.modules.setdefault("es2json", es2json_shim)
    sys.modules.setdefault("dateparser", dateparser_shim)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    esmarc_mod = importlib.import_module("esmarc.esmarc")
    processing = importlib.import_module("esmarc.processing")
    globals_mod = importlib.import_module("esmarc.globals")
    globals_mod.initialize()
    globals_mod.base_id = DEFAULT_CONFIG.base_id
    globals_mod.target_id = DEFAULT_CONFIG.target_id

    def run(record: dict):
        return processing.process_line(
            json.loads(json.dumps(record)), DEFAULT_CONFIG.source_index, esmarc_mod.entities
        )

    return run


def test_synthetic_corpus_roundtrip_and_parity(reference_runtime):
    spec = CorpusSpec(n_docs=N_DOCS, seed=42)
    classes_seen = set()
    for doc_id, record in generate_records(spec):
        # codec invariant holds for synthetic records too
        assert decode_spans(encode_record(record)) == record
        try:
            expected = reference_runtime(record)
        except Exception:
            expected = None
        try:
            produced = map_record(record, DEFAULT_CONFIG)
        except Exception:
            produced = None
        if expected is None:
            assert produced is None, f"{doc_id}: engine emitted, reference dropped"
            continue
        assert produced is not None, f"{doc_id}: engine dropped, reference emitted"
        classes_seen.update(produced.keys())
        assert normalize(produced) == normalize(expected), f"mismatch for {doc_id}"
    assert classes_seen == {
        "resources", "persons", "topics", "organizations", "geo", "works", "events",
    }


def test_date_tail_formats_parity(reference_runtime):
    """Widened date generator: person (100 $d) and publication (264 $c)
    dates drawn from the long-tail formats the deterministic parser now
    covers (approximation markers, seasons, century terms) plus controls.
    Engine and live reference must agree record-by-record (the refshim
    routes the reference's dateparser through the same deterministic
    parser, so this gates the FIELD logic end-to-end over these strings)."""
    from esmarc_ray.corpus import generate_records

    tail_dates = [
        "ca. 1850", "circa 1900", "um 1875", "etwa 1760", "c. 1810",
        "Sommer 1985", "Winter 2001", "Frühjahr 1920", "Herbst 1890",
        "spring 1955", "fall 1971",
        "18. Jh.", "19. Jahrhundert", "17. Jhdt.", "12. Jh",
        "ca. Sommer 1930",          # marker + season compose
        "1850", "3. Mai 1905",      # controls: formats covered before
        "krz. 1850", "25. Jh.",     # must stay unparseable / out of range
    ]
    spec = CorpusSpec(n_docs=len(tail_dates) * 4, seed=7)
    n_checked = 0
    for i, (doc_id, record) in enumerate(generate_records(spec)):
        date = tail_dates[i % len(tail_dates)]
        if "100" in record:
            # birth-death range exercised through dateToEvent
            record["100"][0]["1_"] = [
                sf if "d" not in sf else {"d": f"{date}-"}
                for sf in record["100"][0]["1_"]
            ]
        if "264" in record:
            record["264"][0]["_1"] = [
                sf if "c" not in sf else {"c": date}
                for sf in record["264"][0]["_1"]
            ]
        if "548" in record:
            record["548"][0]["__"][0] = {"a": f"{date}-{date}"}
        try:
            expected = reference_runtime(record)
        except Exception:
            expected = None
        try:
            produced = map_record(record, DEFAULT_CONFIG)
        except Exception:
            produced = None
        if expected is None:
            assert produced is None, f"{doc_id} ({date!r}): engine emitted, reference dropped"
            continue
        assert produced is not None, f"{doc_id} ({date!r}): engine dropped, reference emitted"
        assert normalize(produced) == normalize(expected), f"mismatch for {doc_id} ({date!r})"
        n_checked += 1
    assert n_checked > 40
