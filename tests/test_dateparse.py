"""Unit tests for the deterministic date parser's long-tail formats
(approximation markers, seasons, century terms — reference delegates to the
`dateparser` library, esmarc/dates.py:94; divergence policy SURVEY.md §7.3)."""

from __future__ import annotations

import pytest

from esmarc_ray.dateparse import format_by_period, parse_date_data


@pytest.mark.parametrize(
    "text, expect",
    [
        # approximation markers strip, precision preserved
        ("ca. 1850", "1850"),
        ("circa 1900", "1900"),
        ("um 1875", "1875"),
        ("etwa 1760", "1760"),
        ("about 1810", "1810"),
        ("ca. 3. mai 1905", "1905-05-03"),
        # seasons → conventional starting month, month precision
        ("sommer 1985", "1985-06"),
        ("winter 2001", "2001-12"),
        ("frühjahr 1920", "1920-03"),
        ("herbst 1890", "1890-09"),
        ("spring 1955", "1955-03"),
        ("fall 1971", "1971-09"),
        # century terms → mid-century year, year precision
        ("18. jh.", "1750"),
        ("19. jahrhundert", "1850"),
        ("17. jhdt.", "1650"),
        ("12. jh", "1150"),
        ("18th century", "1750"),
        # composition
        ("ca. sommer 1930", "1930-06"),
        # pre-existing formats unchanged
        ("1850", "1850"),
        ("3. mai 1905", "1905-05-03"),
        ("1905-05", "1905-05"),
    ],
)
def test_tail_formats(text, expect):
    parsed, period = parse_date_data(text)
    assert parsed is not None, text
    assert format_by_period(parsed, period) == expect


@pytest.mark.parametrize(
    "text",
    ["krz. 1850", "25. jh.", "0. jh.", "niemals 1900", "frühling"],
)
def test_still_unparseable(text):
    parsed, period = parse_date_data(text)
    assert parsed is None and period is None
