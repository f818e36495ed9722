"""Footnote and language extractors.

Semantics: reference esmarc/footnotes.py:8-58 and esmarc/language.py:5-39.
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.fields.ids import authority_uri
from esmarc_ray.kernel import marc_values, subfield_sets
from esmarc_ray.lookups import FOOTNOTE_TYPES, K10PLUS_TO_ISO, LANGUAGE_LABELS


def footnotes(record: dict, tags, entity: str, config=DEFAULT_CONFIG):
    """Typed additionalInfo notes (reference footnotes.py:8-58)."""
    per_tag: dict[str, list] = {}
    for tag in tags:
        ssets = list(subfield_sets(record, tag, "*"))
        if ssets:  # the reference's removeEmpty pass only drops empty lists
            per_tag[tag] = ssets
    data = []
    for tag, ssets in per_tag.items():
        for raw in ssets:
            item: dict = {}
            submap = FOOTNOTE_TYPES.get(tag)
            if submap:
                item["@type"] = submap["@type"]
                for code, value in raw.items():
                    if submap.get(code):
                        item[submap[code]] = value
                    if code == "0":
                        links = [value] if isinstance(value, str) else value
                        for link in links:
                            if link.startswith("(DE-627"):
                                item["@id"] = f"{config.target_id}topics/{link[8:]}"
                        item["sameAs"] = authority_uri(links)
            if tag == "937":
                if "d" in raw or "e" in raw or "f" in raw:
                    item["@type"] = "instrumentationNote"
                parts = []
                for code in ("a", "b", "c", "d", "e", "f"):
                    if code in raw:
                        value = raw[code]
                        parts.extend(value if isinstance(value, list) else [value])
                item["description"] = "; ".join(parts)
            if tag == "502":
                parts = []
                for code in ("a", "b", "c", "d"):
                    if code in raw:
                        value = raw[code]
                        parts.extend(value if isinstance(value, list) else [value])
                    item["description"] = ", ".join(parts)
            if len(item) > 1:
                data.append(item)
    return data


def language(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """041$a/$h → ISO-639-2 CategoryCode nodes; "und" fallback for $a only.

    Reference language.py:5-39 with the k10plus remap and label lookups.
    """
    out = []
    for code in marc_values(record, spec):
        iso = K10PLUS_TO_ISO.get(code) or code
        if iso in LANGUAGE_LABELS:
            node = {
                "@type": "CategoryCode",
                "@id": f"http://id.loc.gov/vocabulary/iso639-2/{iso}",
                "codeValue": iso,
                "name": {
                    "en": LANGUAGE_LABELS[iso]["en"],
                    "de": LANGUAGE_LABELS[iso]["de"],
                },
                "inCodeSet": "http://id.loc.gov/vocabulary/iso639-2",
            }
            if node not in out:
                out.append(node)
    if spec[-1] == "a" and not out:
        return {
            "@type": "CategoryCode",
            "@id": "http://id.loc.gov/vocabulary/iso639-2/und",
            "codeValue": "und",
            "name": {"en": "Undetermined", "de": "Nicht zu entscheiden"},
            "inCodeSet": "http://id.loc.gov/vocabulary/iso639-2",
        }
    return out or None
