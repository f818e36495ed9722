"""Engine configuration.

The reference threads ``base_id`` / ``target_id`` through process-wide
module globals (reference: esmarc/globals.py:1-5, set in esmarc/esmarc.py:255-257).
Process globals break actor reuse, so here the same knobs travel in a frozen
dataclass that batch functions and actor constructors capture by value.

Wall-clock dependence in the reference (esmarc/dates.py:114,170,249 uses
``datetime.today()``) is pinned via ``today_year`` so output is deterministic
and reruns are reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # URI prefix that source record ids may carry and that gets stripped
    # before minting target URIs (reference default: esmarc/esmarc.py:250).
    base_id: str = "http://swb.bsz-bw.de/DB=2.1/PPNSET?PPN="
    # URI prefix for all minted entity URIs (reference default: esmarc/esmarc.py:251).
    target_id: str = "https://data.slub-dresden.de/"
    # Name of the source index recorded in isBasedOn (reference: processing.py:53-55).
    source_index: str = "kxp-de14"
    # Pinned "current year" for the not-in-the-future date guard and the
    # two-digit century pivot (reference: dates.py:114,249).
    today_year: int = 2026
    # Pinned two-digit pivot for handle_dateCreated (reference: dates.py:249).
    today_yy: int = 26


DEFAULT_CONFIG = EngineConfig()
