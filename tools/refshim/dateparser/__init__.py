"""Shim of the ``dateparser`` library backed by the engine's deterministic
parser (esmarc_ray.dateparse), so reference and engine agree on every parsed
date during golden generation."""

from tools.refshim.dateparser import date  # noqa: F401
