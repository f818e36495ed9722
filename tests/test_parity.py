"""Full-record parity: engine map_record vs reference-executed goldens.

Goldens at tests/fixtures/goldens_full/ were produced by running the
READ-ONLY reference code on its own 17 records (tools/make_goldens.py).
Lists are compared order-insensitively because the reference's
``list(set(...))`` sites (reference id.py:115,…) are hash-seed-unstable; the
engine uses stable dedup instead (SURVEY.md §7.3).

Also computes the north rule's per-predicate precision/recall over the
flattened triple view and requires P/R == 1.0 on the fixture corpus.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.mapping import doc_to_triples, map_record

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "fixtures" / "goldens_full"
GOLDEN_IDS = sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


def normalize(obj):
    """Canonical form with order-insensitive lists."""
    if isinstance(obj, dict):
        return {k: normalize(v) for k, v in sorted(obj.items())}
    if isinstance(obj, list):
        return sorted(
            (normalize(x) for x in obj), key=lambda x: json.dumps(x, sort_keys=True, ensure_ascii=False)
        )
    return obj


@pytest.mark.parametrize("record_id", GOLDEN_IDS)
def test_full_record_parity(record_id, reference_records):
    golden = json.loads((GOLDEN_DIR / f"{record_id}.json").read_text())
    try:
        produced = map_record(reference_records[record_id], DEFAULT_CONFIG)
    except Exception:
        produced = None  # engine-side drop must line up with a reference drop
    if golden is None:
        assert produced is None
        return
    assert produced is not None, f"engine dropped {record_id}, reference did not"
    assert normalize(produced) == normalize(golden)


def test_per_predicate_precision_recall(reference_records):
    """North-rule metric: per-predicate P/R over (subj, pred, obj) triples."""
    from collections import defaultdict

    stats = defaultdict(lambda: {"tp": 0, "fp": 0, "fn": 0})
    for record_id in GOLDEN_IDS:
        golden = json.loads((GOLDEN_DIR / f"{record_id}.json").read_text())
        try:
            produced = map_record(reference_records[record_id], DEFAULT_CONFIG)
        except Exception:
            produced = None
        gold_triples, mine_triples = set(), set()
        for result, sink in ((golden, gold_triples), (produced, mine_triples)):
            if not result:
                continue
            for entity, doc in result.items():
                for row in doc_to_triples(record_id, entity, normalize(doc)):
                    sink.add((row["subj"], row["pred"], row["obj"]))
        for t in mine_triples & gold_triples:
            stats[t[1]]["tp"] += 1
        for t in mine_triples - gold_triples:
            stats[t[1]]["fp"] += 1
        for t in gold_triples - mine_triples:
            stats[t[1]]["fn"] += 1

    failures = {}
    for pred, s in stats.items():
        precision = s["tp"] / (s["tp"] + s["fp"]) if s["tp"] + s["fp"] else 1.0
        recall = s["tp"] / (s["tp"] + s["fn"]) if s["tp"] + s["fn"] else 1.0
        if precision < 1.0 or recall < 1.0:
            failures[pred] = (round(precision, 3), round(recall, 3), s)
    assert not failures, f"per-predicate P/R below 1.0: {failures}"
