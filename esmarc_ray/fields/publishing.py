"""Publisher / availability / physical-description extractors.

Semantics: reference esmarc/publisher.py:4-61, esmarc/catalogue.py:4-99,
esmarc/editions.py:4-31.  Goldens exist for publisher / originalPublisher /
location (reference tests/out/*).
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.kernel import marc_get, subfield_sets
from esmarc_ray.lookups import COLLECTION_LABELS, PLACE_ROLES, SSG_FID_LABELS


def publisher(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """533$c/$b preferred over 264$b/$a (reference publisher.py:4-23).

    Note the reference's last-occurrence-wins overwrite inside each loop.
    """
    node: dict = {}
    for sset in subfield_sets(record, "533", "*"):
        node["@type"] = "Organization"
        node["name"] = sset.get("c")
        node["location"] = {"@type": "Place"}
        node["location"]["name"] = sset.get("b")
    if not node.get("name"):
        for sset in subfield_sets(record, "264", "*"):
            node["@type"] = "Organization"
            node["name"] = sset.get("b")
            node["location"] = {"@type": "Place"}
            places_ = sset.get("a")
            if isinstance(places_, str):
                sset["a"] = [places_]
            if sset.get("a"):
                node["location"]["name"] = ", ".join(sset["a"])
    return node if node.get("name") else None


def original_publisher(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """264 publisher only when BOTH 533 and 264 exist (reference publisher.py:26-40)."""
    node: dict = {}
    if record.get("533") and record.get("264"):
        for sset in subfield_sets(record, "264", "*"):
            node["@type"] = "Organization"
            node["name"] = sset.get("b")
            node["location"] = {"@type": "Place"}
            places_ = sset.get("a")
            if isinstance(places_, str):
                sset["a"] = [places_]
            if sset.get("a"):
                node["location"]["name"] = ", ".join(sset["a"])
    return node if node.get("name") else None


def publish_location(record: dict, tag, entity: str, config=DEFAULT_CONFIG):
    """751 publication-place nodes typed via $4 (reference publisher.py:43-61)."""
    out = []
    for sset in subfield_sets(record, tag, "*"):
        node: dict = {}
        if sset.get("4"):
            node["@type"] = PLACE_ROLES[sset["4"]]
        node["preferredName"] = sset.get("a")
        zeros = sset.get("0")
        if isinstance(zeros, str):
            zeros = [zeros]
            sset["0"] = zeros
        if zeros:
            for item in zeros:
                if item.startswith("(DE-627"):
                    node["@id"] = f"{config.target_id}geo/{item.split(')')[1]}"
        if node.get("preferredName"):
            out.append(node)
    return out or None


def offers(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """SLUB availability Offer when a 924$b equals DE-14 (reference catalogue.py:4-27)."""
    out = []
    ppn = marc_get(record, specs[1])
    branch_codes = marc_get(record, specs[0])
    if ppn and isinstance(branch_codes, str) and branch_codes == "DE-14":
        branch_codes = [branch_codes]
    if ppn and isinstance(branch_codes, list):
        for code in branch_codes:
            if code == "DE-14":
                out.append(
                    {
                        "@type": "Offer",
                        "offeredBy": {
                            "@id": f"{config.target_id}organizations/191800287",
                            "@type": "Library",
                            "name": "Sächsische Landesbibliothek – Staats- und Universitätsbibliothek Dresden",
                            "branchCode": "DE-14",
                        },
                        "availability": f"https://katalog.slub-dresden.de/id/0-{ppn}",
                    }
                )
    return out or None


def access_mode(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """007 cr/cz prefix → online, else local (reference catalogue.py:30-38)."""
    value = marc_get(record, spec)
    # precedence quirk preserved: the second comparison is unguarded in the
    # reference, so a missing 007 raises (record drop) — catalogue.py:35
    if (isinstance(value, str) and value[0:2] == "cr") or value[0:2] == "cz":
        return "online"
    return "local"


def physical_description(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """Fixed 300/533 submap (reference catalogue.py:41-55)."""
    submap = {
        "extent": "300..a",
        "physical_details": "300..b",
        "dimensions": "300..c",
        "accompanying_material": "300..e",
        "reproduction_extent": "533..e",
    }
    out = {}
    for target, spec in submap.items():
        value = marc_get(record, spec)
        if value:
            out[target] = value
    return out or None


def collection(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """SSG/FID (084) and collection (935) code labels (reference catalogue.py:58-77)."""
    out = []
    for spec in specs:
        value = marc_get(record, spec)
        if value:
            if isinstance(value, str):
                value = [value]
            for item in value:
                if spec.startswith("084") and item in SSG_FID_LABELS:
                    out.append({"preferredName": SSG_FID_LABELS[item], "abbr": item})
                if spec.startswith("935") and item in COLLECTION_LABELS:
                    out.append({"preferredName": COLLECTION_LABELS[item], "abbr": item})
    return out or None


def usage_info(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    """506/540 access & licence state nodes (reference catalogue.py:80-99)."""
    state_by_tag = {"506": "accessState", "540": "licenceState"}
    out = []
    for spec in specs:
        tag, _, indicator = spec.partition(".")
        for sset in subfield_sets(record, tag, indicator):
            node = {"@type": state_by_tag[tag]}
            if sset.get("a"):
                node["name"] = sset["a"]
                node["alternateName"] = sset.get("f")
            elif sset.get("f"):
                node["name"] = sset["f"]
            node["sameAs"] = sset.get("u")
            out.append(node)
    return out or None


def edition_statement(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """250 "a, b" only when both present (reference editions.py:4-11)."""
    a = marc_get(record, "250..a")
    b = marc_get(record, "250..b")
    if a and b:
        return f"{a}, {b}"
    return None


def edition_sequence(record: dict, tag, entity: str, config=DEFAULT_CONFIG):
    """First 362 ind 0_ $a (reference editions.py:14-23)."""
    for occurrence in record.get(tag, []):
        if "0_" in occurrence:
            for subfield in occurrence["0_"]:
                if "a" in subfield:
                    return subfield["a"]
    return None


def reproduction_series_statement(record: dict, spec, entity: str, config=DEFAULT_CONFIG):
    """533$f name node (reference editions.py:26-31)."""
    value = marc_get(record, spec)
    return {"name": value} if value else None
