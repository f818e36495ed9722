"""Shim of the reference's external ``es2json`` dependency (not installed in
this container) — just enough to *execute* the read-only reference code at
/root/reference for golden generation.  Behavior reimplemented from observed
call-site semantics; the engine's own equivalents live in esmarc_ray.values.
"""

from __future__ import annotations

import sys

from esmarc_ray.values import collapse as ArrayOrSingleValue  # noqa: N812
from esmarc_ray.values import merge_value as litter  # noqa: N812


def isint(value) -> bool:
    try:
        int(value)
        return True
    except (TypeError, ValueError):
        return False


def eprint(*args, **kwargs) -> None:
    print(*args, file=sys.stderr, **kwargs)


class ESGenerator:  # pragma: no cover - never used by golden generation
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("no Elasticsearch in golden generation")


class IDFile(ESGenerator):
    pass
