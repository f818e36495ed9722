"""Small extractors: gender, page counts, coordinates, sameAs, genre.

Semantics: reference esmarc/gender.py, nop.py, coordinates.py, sameAs.py,
genre.py.
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.fields.ids import authority_uri
from esmarc_ray.kernel import marc_get, subfield_sets
from esmarc_ray.lookups import ISIL_AUTHORITIES
from esmarc_ray.values import is_intlike, merge_value


def gender(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """Always None.

    The reference's handlesex swaps its getmarc arguments while iterating the
    characters of the spec string (gender.py:8-9), so it can never find a
    value; the observable output is "gender absent" — replicated as a
    constant None (SURVEY.md §7.0 quirk policy).
    """
    return None


def number_of_pages(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """300$a-g "N S." → int; last list element decides (reference nop.py:5-24)."""
    value = marc_get(record, specs)
    try:
        if isinstance(value, str):
            value = [value]
        if isinstance(value, list):
            for number in value:
                if "S." in number and is_intlike(number.split("S.")[0].strip()):
                    value = int(number.split("S.")[0])
                else:
                    value = None
    except IndexError:
        pass
    except Exception:
        # the reference logs to errors.txt and returns the partial value
        pass
    return value


def _first_dotted(value) -> str | None:
    """First string containing "." anywhere in a nested value (coordinates.py:4-11)."""
    if isinstance(value, str):
        return value if "." in value else None
    if isinstance(value, list):
        for item in value:
            found = _first_dotted(item)
            if found:
                return found
    if isinstance(value, dict):
        for item in value.values():
            found = _first_dotted(item)
            if found:
                return found
    return None


def geo_coordinates(record: dict, spec: dict, entity: str, config=DEFAULT_CONFIG):
    """034 lat/lon with N/E stripped and S/W negated (reference coordinates.py:14-26)."""
    node: dict = {}
    for axis, sources in spec.items():
        coordinate = _first_dotted(marc_get(record, sources))
        if coordinate:
            node["@type"] = "GeoCoordinates"
            node[axis] = (
                coordinate.replace("N", "").replace("S", "-").replace("E", "").replace("W", "-")
            )
    return node or None


def cartographic_data(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """255 scale/projection/coordinates (reference coordinates.py:29-45)."""
    out = {}
    for target, path in (("scale", "255..a"), ("projection", "255..b"), ("coordinates", "255..c")):
        value = marc_get(record, path)
        if value:
            out[target] = value
    return out or None


def same_as(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """sameAs nodes for KXP/DNB/RISM etc. (reference sameAs.py:7-32).

    Only the literal specs "016" and "035..a" are handled — a "670..u" in the
    spec list is silently ignored, exactly like the reference.
    """
    nodes = []
    data: list | str = []
    for spec in specs:
        if spec == "016":  # ISIL in $2, id in $a
            for sset in subfield_sets(record, spec, "*"):
                if sset.get("a") and sset.get("2"):
                    data = merge_value(data, f"({sset['2']}){sset['a']}")
        elif spec == "035..a":  # both already combined in $a
            data = merge_value(data, marc_get(record, spec))
    if isinstance(data, str):
        data = [data]
    if isinstance(data, list):
        for token in data:
            prefix = token[0:8]
            if prefix in ISIL_AUTHORITIES:
                node = dict(ISIL_AUTHORITIES[prefix])
                node["@id"] = authority_uri(token)
                node["isBasedOn"] = {"@type": "Dataset", "@id": ""}
                nodes.append(node)
    return nodes


def genre(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """655$a Text node (reference genre.py:4-11)."""
    value = marc_get(record, spec)
    if value:
        return {"@type": "Text", "Text": value}
    return None
