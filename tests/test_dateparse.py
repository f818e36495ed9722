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


# -- property fuzz: generated known-format dates must round-trip ------------
#
# The real `dateparser` library (reference esmarc/dates.py:2,94) is not
# installable here, so the property gate generates strings in formats the
# library's public repertoire documents (month-name orders, slash/dotted
# numerics, approximation prefixes, cataloguing decorations) and pins the
# deterministic parser's output to the generated components — any format the
# generator can build that the parser mishandles is a divergence to promote.

from hypothesis import given, settings
from hypothesis import strategies as st

_MONTH_NAMES = {
    1: ["january", "januar", "jan"], 2: ["february", "februar", "feb"],
    3: ["march", "märz", "mar"], 4: ["april", "apr"], 5: ["may", "mai"],
    6: ["june", "juni", "jun"], 7: ["july", "juli", "jul"],
    8: ["august", "aug"], 9: ["september", "sep"],
    10: ["october", "oktober", "okt"], 11: ["november", "nov"],
    12: ["december", "dezember", "dez"],
}


@st.composite
def _rendered_date(draw):
    year = draw(st.integers(1000, 2025))
    month = draw(st.integers(1, 12))
    day = draw(st.integers(1, 28))
    name = draw(st.sampled_from(_MONTH_NAMES[month]))
    template, period = draw(st.sampled_from([
        ("{y}", "year"),
        ("{y}-{m:02d}", "month"),
        ("{y}-{m:02d}-{d:02d}", "day"),
        ("{y}/{m}/{d}", "day"),
        ("{d}.{m}.{y}", "day"),
        ("{d}. {m}. {y}", "day"),
        ("{m}.{y}", "month"),
        ("{d}. {name} {y}", "day"),
        ("{name} {y}", "month"),
        ("{name} {d}, {y}", "day"),
        ("{y} {name}", "month"),
    ]))
    text = template.format(y=year, m=month, d=day, name=name)
    decoration = draw(st.sampled_from(
        ["{}", "ca. {}", "circa {}", "um {}", "etwa {}", "[{}]", "{}?",
         "  {}  ", "im jahre {}", "anno {}"]
    ))
    # prefix decorations only compose with text, not with themselves
    text = decoration.format(text)
    expect_day = day if period == "day" else 1
    expect_month = month if period in ("day", "month") else 1
    return text, (year, expect_month, expect_day), period


@settings(max_examples=300, deadline=None)
@given(_rendered_date())
def test_fuzz_known_formats_roundtrip(case):
    text, (y, m, d), period = case
    parsed, got_period = parse_date_data(text)
    assert parsed is not None, text
    assert (parsed.year, parsed.month, parsed.day) == (y, m, d), text
    assert got_period == period, text
