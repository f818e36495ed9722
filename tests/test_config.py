"""Unit tests for the shared shuffle-width knob (no Ray session needed)."""

from __future__ import annotations

import os

from esmarc_ray.config import derive_partitions


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("ESMARC_NUM_PARTITIONS", "123")
    assert derive_partitions(10 << 40) == 123


def test_byte_derived_scales_with_size(monkeypatch):
    monkeypatch.delenv("ESMARC_NUM_PARTITIONS", raising=False)
    small = derive_partitions(1 << 20)        # 1 MiB → floor
    big = derive_partitions(1 << 40)          # 1 TiB
    huge = derive_partitions(100 << 40)       # 100 TiB
    assert small == 8
    assert big == 8192                        # ceil(1 TiB / 128 MiB)
    assert huge == 65536                      # capped at the ceiling
    assert small < big <= huge


def test_cpu_fallback_without_size(monkeypatch):
    monkeypatch.delenv("ESMARC_NUM_PARTITIONS", raising=False)
    n = derive_partitions(None)
    # 2×cluster CPUs when a Ray session is live, else the 64 legacy default;
    # both land inside the clamp
    assert 8 <= n <= 65536
