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
