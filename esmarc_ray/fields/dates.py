"""Date-field extractors.

Semantics: reference esmarc/dates.py:7-252.  Wall-clock reads
(dates.py:114,170,249) are pinned through :class:`esmarc_ray.config.EngineConfig`.
Failure behavior is part of the contract: the reference drops the whole record
when a date sset lacks $i/$a (KeyError escapes to the worker catch-all,
esmarc/esmarc.py:320-322) — these extractors raise in the same situations and
the mapping layer routes the record to the dead-letter output.
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG, EngineConfig
from esmarc_ray.dateparse import format_by_period, parse_date_data
from esmarc_ray.kernel import marc_get
from esmarc_ray.values import collapse, is_intlike, merge_value


def _split_date_spec(spec: str) -> tuple[str, str | list[str]]:
    """Split ``548^datl,datx`` into (tag, datekey list-or-string).

    No ``^`` → empty-string key set, which matches nothing (substring check
    against "" is always False) — reference startDate/endDate:7-37.
    """
    if "^" not in spec:
        return spec, ""
    tag, _, keys = spec.partition("^")
    return (tag, keys.split(",") if "," in keys else keys)


def start_date(record: dict, spec: str, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    tag, datekeys = _split_date_spec(spec)
    return _marc_dates(record.get(tag), "startDate", datekeys, config)


def end_date(record: dict, spec: str, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    tag, datekeys = _split_date_spec(spec)
    return _marc_dates(record.get(tag), "endDate", datekeys, config)


def _marc_dates(field, event: str, datekeys, config: EngineConfig):
    """Pick the date occurrence (preferring an "exakt" $i) and build the node.

    Reference dates.py:40-73 — including its quirks: the "exakt" scan keeps
    only the LAST occurrence index and resets to 0 when a later non-exakt
    occurrence follows; missing $i raises (record drop).
    """
    candidates = []
    if field:
        for occurrence in field:
            for subfields in occurrence.values():
                sset: dict = {}
                for subfield in subfields:
                    for code, value in subfield.items():
                        if code in ("a", "4", "i"):
                            sset[code] = merge_value(sset.get(code), collapse(value))
                if "4" in sset and sset["4"] in datekeys:
                    candidates.append(sset)
    if not candidates:
        return None
    chosen = 0
    for n, candidate in enumerate(candidates):
        # candidate['i'] raises KeyError when $i is absent — intended (see module doc)
        if "exakt" in candidate["i"].lower():
            chosen = n
        else:
            chosen = 0
    if candidates[chosen]["4"] not in datekeys:
        return None
    picked = candidates[chosen]
    node = {
        "@value": date_to_event(picked["a"], event, config),
        "disambiguatingDescription": picked["i"],
        "description": picked["a"],
    }
    if node["@value"]:
        return node
    if node["description"]:
        node.pop("@value")
        if "-" in node["description"]:
            halves = node["description"].split("-")
            if event == "startDate" and halves[0]:
                return node
            if event == "endDate" and halves[1]:
                return node
    return None


def date_to_event(date, event: str, config: EngineConfig = DEFAULT_CONFIG):
    """Parse one raw date (or range half) to an ISO string.

    Reference dates.py:76-126.  A list input there builds a result and then
    falls through to crash (dates.py:85-90) — replicated as an explicit raise
    so the record lands in the dead-letter output, matching the observable
    drop.  An open range end ("1979-") yields None for endDate (still alive).
    """
    date = collapse(date)
    if not date:
        return None
    if isinstance(date, list):
        raise TypeError("list-valued date crashes the reference (dates.py:85-90)")
    if "[" in date and "]" in date:
        date = date.split("[")[1].split("]")[0]
    parsed = None
    period = None
    if "-" in date:
        halves = date.split("-")
        if event == "startDate":
            parsed, period = parse_date_data(halves[0])
        elif event == "endDate":
            if len(halves) == 2 and halves[1]:
                parsed, period = parse_date_data(halves[1])
            elif len(halves) == 1:
                return None
    else:
        parsed, period = parse_date_data(date.lower())
    if parsed and int(parsed.strftime("%Y")) < config.today_year and len(parsed.strftime("%Y")) == 4:
        return format_by_period(parsed, period)
    return None


def parse_single_date(text, config: EngineConfig = DEFAULT_CONFIG):
    """Reference parseDate (dates.py:158-182): brackets, lowercase, future guard."""
    if isinstance(text, list):
        text = text[0]
    if "[" in text and "]" in text:
        text = text.split("[")[1].split("]")[0]
    parsed, period = parse_date_data(text.lower())
    if parsed and int(parsed.strftime("%Y")) < config.today_year and len(parsed.strftime("%Y")) == 4:
        return format_by_period(parsed, period)
    return None


def publication_date_node(date, config: EngineConfig = DEFAULT_CONFIG):
    """Reference handle_260 (dates.py:185-213): {dateOrigin, dateParsed*} node."""
    if isinstance(date, list):
        out = []
        for item in date:
            node = publication_date_node(item, config)
            if node:
                out.append(node)
        return collapse(out)
    if not date:
        return None
    node = {"dateOrigin": date}
    if "-" in date:
        halves = date.split("-")
        if halves[0]:
            earliest = parse_single_date(halves[0], config)
            if earliest:
                node["dateParsedEarliest"] = earliest
        if halves[1]:
            latest = parse_single_date(halves[1], config)
            if latest:
                node["dateParsedLatest"] = latest
    else:
        parsed = parse_single_date(date, config)
        if parsed:
            node["dateParsed"] = parsed
    return node if node["dateOrigin"] else None


def date_published(record: dict, spec, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    """Priority 533$d → 264$c → (534 present: 008[7:11]); reference dates.py:129-143.

    Dotted indicator specs like "533.__.d" are equivalent to "533..d" — the
    kernel, like the reference's getmarcvalues, only reads tag and code.
    """
    from_533 = marc_get(record, "533.__.d")
    from_264 = marc_get(record, "264.*.c")
    from_534 = marc_get(record, "534.__.c")
    from_008 = marc_get(record, "008")
    if from_533:
        return publication_date_node(from_533, config)
    if from_264:
        return publication_date_node(from_264, config)
    if from_534:
        return publication_date_node(from_008[7:11], config)
    return None


def date_original_published(record: dict, spec, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    """Reference dates.py:146-155 (unused in the mapping table; kept for parity)."""
    from_533 = marc_get(record, "533.__.d")
    from_264 = marc_get(record, "264.*.c")
    from_534 = marc_get(record, "534.__.c")
    if from_533:
        return publication_date_node(from_264, config)
    if from_534:
        return publication_date_node(from_534, config)
    return None


def date_modified(record: dict, spec, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    """005 ``YYYYMMDDhhmmss.f`` → ``YYYY-MM-DDThh:mm:ssZ``; non-digit pairs → 00.

    Reference dates.py:216-237.
    """
    raw = marc_get(record, spec)
    if not raw:
        return None
    out = ""
    for i in range(0, 13, 2):
        out += raw[i : i + 2] if is_intlike(raw[i : i + 2]) else "00"
        if i in (2, 4):
            out += "-"
        elif i == 6:
            out += "T"
        elif i in (8, 10):
            out += ":"
        elif i == 12:
            out += "Z"
    return out


def date_created(record: dict, spec, entity: str, config: EngineConfig = DEFAULT_CONFIG):
    """008[0:6] YYMMDD with a pinned two-digit century pivot.

    Reference dates.py:240-252 pivots on the *current* date; pinned to
    config.today_yy for determinism.  Missing 008 raises (record drop),
    matching the reference's TypeError on None.
    """
    raw = marc_get(record, spec)
    yy, mm, dd = int(raw[0:2]), int(raw[2:4]), int(raw[4:6])
    century = "19" if yy > config.today_yy else "20"
    return f"{century}{yy:02d}-{mm:02d}-{dd:02d}"
