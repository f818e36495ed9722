"""Name extractors: preferredName, alternateName, contributor nodes.

Semantics: reference esmarc/namings.py:8-119.  Quirks preserved (SURVEY.md
§7.0 quirk policy — replicate observable outputs):

* the contributor name assembly takes ``value[0]`` of each ordered subfield —
  for a *string* value that is its first character (namings.py:87-94);
* Organization contributors get an ``@id`` prefix only when $0 is present.
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.kernel import marc_get, subfield_sets
from esmarc_ray.lookups import ROLE_LABELS_EN


def preferred_name(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """Joined display name; list values joined with " " (namings.py:8-15)."""
    data = alternate_names(record, spec, entity, config)
    if isinstance(data, list):
        data = " ".join(data)
    return data or None


def alternate_names(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """marc_get with a trailing " /" strip (namings.py:18-30)."""
    data = marc_get(record, spec)
    if isinstance(data, str):
        if data.endswith(" /"):
            data = data[:-2]
    elif isinstance(data, list):
        data = [item[:-2] if item.endswith(" /") else item for item in data]
    return data or None


def topic_preferred_name(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """150 $a + " / $x" + " ($g)" concatenation (namings.py:33-50)."""
    name = ""
    for occurrence in record.get(spec, []):
        for subfields in occurrence.values():
            for subfield in subfields:
                for code, value in subfield.items():
                    if code == "a":  # single-valued per the cataloguing rules
                        name = value
                    elif code == "x":  # repeatable
                        name += f" / {value}"
                    elif code == "g":  # repeatable
                        name += f" ({value})"
    return name or None


def contributors(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """Typed Person/Organization/Event contributor nodes (namings.py:53-119)."""
    nodes = []
    for tag in specs:
        for sset in subfield_sets(record, tag, "*"):
            order = None
            node: dict = {}
            if (tag == "110" and not sset.get("c")) or (tag == "710" and not sset.get("t")):
                node["@type"] = "Organization"
                if sset.get("0"):
                    node["@id"] = f"{config.target_id}organizations/"
                order = ["a", "b", "g"]
            elif (tag == "110" and sset.get("c")) or (tag == "711" and not sset.get("t")) or tag == "111":
                node["@type"] = "Event"
                node["@id"] = f"{config.target_id}events/"
                node["name"] = ""
                order = ["a", "n", "d", "c", "e", "g"]
            elif tag in ("100", "700") and not sset.get("t"):
                node["@type"] = "Person"
                if sset.get("0"):
                    node["@id"] = f"{config.target_id}persons/"
                node["name"] = ""
                if isinstance(sset.get("a"), str):
                    node["name"] += sset["a"]
                elif isinstance(sset.get("a"), list):
                    node["name"] += sset["a"][0]
                if isinstance(sset.get("b"), str):
                    node["name"] += " " + sset["b"]
                if isinstance(sset.get("c"), str):
                    node["name"] += ", " + sset["c"]
                elif isinstance(sset.get("c"), list):
                    node["name"] += ", " + ", ".join(sset["c"])
            if order:
                # value[0]: first list element — or first CHARACTER of a string
                # (reference quirk, namings.py:87-94)
                name = ""
                for code in order:
                    if code in sset:
                        name += sset[code][0] + ", "
                node["name"] = name[:-2]
            zero_values = sset.get("0")
            if zero_values:
                if isinstance(zero_values, str):
                    zero_values = [zero_values]
                for item in zero_values:
                    if item.startswith("(DE-627)") and node.get("@id"):
                        node["@id"] += item.split(")")[1]
                    if item.startswith("(DE-588)"):
                        node["sameAs"] = "https://d-nb.info/gnd/" + item.split(")")[1]
            roles = sset.get("4")
            if roles is not None:
                if isinstance(roles, str):
                    roles = [roles]
                for code in roles:
                    if code in ROLE_LABELS_EN:
                        node.setdefault("roles", []).append(
                            {
                                "@type": "Role",
                                "@id": f"https://id.loc.gov/vocabulary/relators/{code}",
                                "name": ROLE_LABELS_EN[code],
                            }
                        )
            nodes.append(node)
    return nodes or None
