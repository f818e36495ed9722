from __future__ import annotations

import json
import pathlib

import pytest

REFERENCE_IN = pathlib.Path("/root/reference/tests/in")
REFERENCE_OUT = pathlib.Path("/root/reference/tests/out")
FIXTURE_IDS = sorted(p.name for p in REFERENCE_IN.iterdir())


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture()
def reference_records() -> dict[str, dict]:
    """The 17 raw MARC21-JSON records of the reference test corpus.

    Function-scoped on purpose: the extraction kernel mirrors the reference's
    ``litter`` aliasing (a list-spec ``marc_get`` can append into a record's
    own field list, exactly like the reference — the per-record parse gives
    each record a fresh dict in production), so shared record dicts would
    leak mutations across tests.
    """
    return {rid: json.loads((REFERENCE_IN / rid).read_text()) for rid in FIXTURE_IDS}


def load_golden(field: str, record_id: str):
    return json.loads((REFERENCE_OUT / field / record_id).read_text())
