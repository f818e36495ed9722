"""Deterministic date parsing.

The reference shells out to the ``dateparser`` library
(reference esmarc/dates.py:2,94,167) whose behavior is locale- and
wall-clock-dependent.  This module reimplements the subset of formats the
MARC corpus actually exercises (bare years, DD.MM.YYYY, German/English month
names, YYYY-MM[-DD]) deterministically; everything else parses to None, which
the P/R tolerance of the parity gate absorbs (SURVEY.md §7.3).

API mirrors what the reference consumes: :func:`parse_date_data` returns
``(datetime, period)`` with period ∈ {"year", "month", "day"} or
``(None, None)``.
"""

from __future__ import annotations

import datetime
import re

_MONTHS = {
    # English
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
    # German
    "januar": 1, "februar": 2, "märz": 3, "maerz": 3, "mai": 5, "juni": 6,
    "juli": 7, "oktober": 10, "dezember": 12,
    # common abbreviations
    "jan": 1, "feb": 2, "mar": 3, "mär": 3, "apr": 4, "jun": 6, "jul": 7,
    "aug": 8, "sep": 9, "sept": 9, "okt": 10, "oct": 10, "nov": 11,
    "dez": 12, "dec": 12,
}

_RE_YEAR = re.compile(r"^(\d{3,4})$")
_RE_ISO = re.compile(r"^(\d{4})[-/](\d{1,2})(?:[-/](\d{1,2}))?$")
_RE_DOTTED = re.compile(r"^(?:(\d{1,2})\.\s*)?(\d{1,2})\.\s*(\d{4})$")
_RE_MONTHNAME = re.compile(r"^(?:(\d{1,2})\.?\s+)?([a-zäöü]+)\.?\s+(\d{4})$")
# English comma style ("May 3, 1905") and year-first ("1905 May") — both in
# the real library's default English repertoire
_RE_MONTH_DAY_YEAR = re.compile(r"^([a-zäöü]+)\.?\s+(\d{1,2}),?\s+(\d{4})$")
_RE_YEAR_MONTH = re.compile(r"^(\d{4})\s+([a-zäöü]+)\.?$")

# -- long-tail formats (the `dateparser` library's observed MARC tail) -------
#
# Approximation markers strip before the regular parse ("ca. 1900",
# "circa 1900", "um 1900", "c. 1900", "approx. 1900", "etwa 1900" — German
# cataloguing convention); seasons resolve to their conventional starting
# month at month precision; century terms ("18. Jh.", "19. Jahrhundert",
# "18th century") resolve to the MID-century year at year precision — a
# scalar stand-in for the range, chosen over the century start so the value
# is unbiased for dating purposes.  All documented divergence policy per
# SURVEY.md §7.3 (the real library is wall-clock/locale dependent and not
# installable here).
_RE_APPROX = re.compile(
    r"^(?:ca|c|circa|um|etwa|approx|approximately|about|im\s+jahre?|anno)"
    r"\.?\s+(.+)$"
)
_SEASONS = {
    # German
    "frühling": 3, "fruehling": 3, "frühjahr": 3, "fruehjahr": 3,
    "sommer": 6, "herbst": 9, "winter": 12,
    # English
    "spring": 3, "summer": 6, "autumn": 9, "fall": 9,
}
_RE_SEASON = re.compile(r"^([a-zäöü]+)\s+(\d{4})$")
_RE_CENTURY = re.compile(
    r"^(\d{1,2})\.?\s*(?:jh|jhdt|jahrhundert|th\s+century|st\s+century|"
    r"nd\s+century|rd\s+century)\.?$"
)


def parse_date_data(text: str) -> tuple[datetime.datetime | None, str | None]:
    """Parse ``text`` to (datetime, precision period); (None, None) on failure."""
    if not isinstance(text, str):
        return None, None
    text = text.strip().strip(".").strip().lower()
    # cataloguing uncertainty decorations: "[1850]", "1850?" — strip the
    # wrapper, keep the precision of what's inside (the real library's
    # behavior for these MARC 260$c conventions)
    if len(text) >= 2 and text[0] == "[" and text[-1] == "]":
        text = text[1:-1].strip()
    text = text.rstrip("?").strip()
    if not text:
        return None, None

    m = _RE_YEAR.match(text)
    if m:
        return _mk(int(m.group(1)), 1, 1), "year"

    m = _RE_ISO.match(text)
    if m:
        year, month, day = int(m.group(1)), int(m.group(2)), m.group(3)
        if day is not None:
            return _mk(year, month, int(day)), "day"
        return _mk(year, month, 1), "month"

    m = _RE_DOTTED.match(text)
    if m:
        day, month, year = m.group(1), int(m.group(2)), int(m.group(3))
        if day is not None:
            return _mk(year, month, int(day)), "day"
        return _mk(year, month, 1), "month"

    m = _RE_MONTHNAME.match(text)
    if m:
        day, monthname, year = m.group(1), m.group(2), int(m.group(3))
        month = _MONTHS.get(monthname)
        if month:
            if day is not None:
                return _mk(year, month, int(day)), "day"
            return _mk(year, month, 1), "month"

    m = _RE_MONTH_DAY_YEAR.match(text)
    if m:
        month = _MONTHS.get(m.group(1))
        if month:
            return _mk(int(m.group(3)), month, int(m.group(2))), "day"

    m = _RE_YEAR_MONTH.match(text)
    if m:
        month = _MONTHS.get(m.group(2))
        if month:
            return _mk(int(m.group(1)), month, 1), "month"

    # -- long tail: approximation marker, season, century ------------------
    m = _RE_APPROX.match(text)
    if m:
        return parse_date_data(m.group(1))

    m = _RE_SEASON.match(text)
    if m and m.group(1) in _SEASONS:
        return _mk(int(m.group(2)), _SEASONS[m.group(1)], 1), "month"

    m = _RE_CENTURY.match(text)
    if m:
        century = int(m.group(1))
        if 1 <= century <= 21:
            return _mk((century - 1) * 100 + 50, 1, 1), "year"

    return None, None


def _mk(year: int, month: int, day: int) -> datetime.datetime | None:
    try:
        return datetime.datetime(year, month, day)
    except ValueError:
        return None


def format_by_period(parsed: datetime.datetime, period: str) -> str:
    """Precision-dependent ISO formatting (reference dates.py:115-126)."""
    if period == "year":
        return parsed.strftime("%Y")
    if period in ("month", "week"):
        return parsed.strftime("%Y-%m")
    return parsed.strftime("%Y-%m-%d")
