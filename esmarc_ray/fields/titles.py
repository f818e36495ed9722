"""Title-object assembly.

Semantics: reference esmarc/namings.py:122-293 (``gettitle``) — the most
order-sensitive extractor: the preferredName string is assembled in record
order as ``a : b. p / c``; 246-31 parallel-title values are *subtracted* from
245$b (namings.py:150-154); uniform titles resolve $0 through the authority
table.  Quirks preserved: a lone unresolvable $0 (e.g. ``(DE-576)``) in a
uniform-title field crashes the reference (enumerate(None)) and drops the
record — replicated as a raise.
"""

from __future__ import annotations

from esmarc_ray.config import DEFAULT_CONFIG
from esmarc_ray.fields.ids import authority_uri, mint_uri
from esmarc_ray.kernel import subfield_sets
from esmarc_ray.values import merge_value


def title_object(record: dict, specs, entity: str, config=DEFAULT_CONFIG):
    title: dict = {}

    parallel_a = None
    parallel_b = None
    # parallel titles (246 ind 31)
    for sset in subfield_sets(record, "246", "31"):
        node: dict = {}
        if sset.get("a"):
            node["mainTitle"] = sset["a"]
            parallel_a = sset["a"]
        if sset.get("b"):
            node["subTitle"] = sset["b"]
            parallel_b = sset["b"]
        if sset.get("a") and sset.get("b"):
            node["preferredName"] = f"{sset['a']} : {sset['b']}"
        if node:
            title["parallelTitles"] = merge_value(title.get("parallelTitles"), node)

    # main title (245): preferredName assembled as  a : b. p / c
    for sset in subfield_sets(record, "245", "*"):
        title["preferredName"] = ""
        if sset.get("a"):
            title["preferredName"] += sset["a"]
            title["mainTitle"] = sset["a"]
        if sset.get("b"):
            sub = sset["b"]
            if parallel_a and parallel_a in sub:
                sub = sub.replace(f" = {parallel_a}", "")
            if parallel_b and parallel_b in sub:
                sub = sub.replace(f" : {parallel_b}", "")
            sset["b"] = sub
            title["preferredName"] += f" : {sub}"
            title["subTitle"] = sub
        if sset.get("n"):
            part_numbers = sset["n"] if isinstance(sset["n"], list) else [sset["n"]]
            title["partStatement"] = part_numbers
        if sset.get("p"):
            part_names = sset["p"] if isinstance(sset["p"], list) else [sset["p"]]
            if not title.get("partStatement"):
                title["partStatement"] = ["" for _ in part_names]
            else:
                while len(title["partStatement"]) < len(part_names):
                    title["partStatement"].append("")
            for n, item in enumerate(part_names):
                title["partStatement"][n] += f" {item}"
        if title.get("partStatement"):
            for item in title["partStatement"]:
                title["preferredName"] += ". "
                title["preferredName"] += item
        if sset.get("c"):
            title["preferredName"] += f" / {sset['c']}"
            title["responsibilityStatement"] = sset["c"]

    # other-parts titles (249)
    for sset in subfield_sets(record, "249", "*"):
        node = {}
        if sset.get("a"):
            node["mainTitle"] = sset["a"]
        if sset.get("b"):
            node["subTitle"] = sset["b"]
        if sset.get("v"):
            if not node.get("responsibilityStatement"):
                node["responsibilityStatement"] = sset["v"]
        if sset.get("c"):
            if not node.get("responsibilityStatement"):
                node["responsibilityStatement"] = sset["c"]
            else:
                node["responsibilityStatement"] += f", {sset['c']}"
        if sset.get("a"):
            if isinstance(sset["a"], list):
                node["preferredName"] = " ; ".join(sset["a"])
            else:
                node["preferredName"] = sset["a"]
        if sset.get("v"):
            if node.get("preferredName"):
                node["preferredName"] += f" / {sset['v']}"
            else:
                node["preferredName"] = sset["v"]
        if node:
            title["otherPartsTitle"] = merge_value(title.get("otherPartsTitle"), node)

    # enclosed works (501 / 505-80)
    additional: dict = {}
    for sset in subfield_sets(record, "501", "__"):
        if sset.get("a"):
            additional["notes"] = sset["a"]
    for sset in subfield_sets(record, "505", "80"):
        enclosed = {}
        if sset.get("a"):
            additional["notes"] = merge_value(additional.get("notes"), sset["a"])
        if sset.get("t"):
            enclosed["preferredName"] = sset["t"]
        if sset.get("r"):
            enclosed["contributor"] = sset["r"]
        if sset.get("g"):
            enclosed["note"] = sset["g"]
        if enclosed:
            additional["enclosedParts"] = merge_value(additional.get("enclosedParts"), enclosed)
    if additional:
        title["additionalInfo"] = additional

    # journal short title (210-10) and varying titles (246-1_/33)
    for sset in subfield_sets(record, "210", "10"):
        if sset.get("a"):
            title["shortTitle"] = sset["a"]
    varying: list = []
    for sset in subfield_sets(record, "246", "1_"):
        node = {}
        if sset.get("a"):
            node["preferredName"] = sset["a"]
        if sset.get("i"):
            node["disambiguatingDescription"] = sset["i"]
        if node:
            varying = merge_value(varying, node)
    for sset in subfield_sets(record, "246", "33"):
        value = sset.get("a")
        if value:
            varying = merge_value(varying, {"preferredName": value})
    if varying:
        title["varyingTitles"] = varying

    former: list = []
    for sset in subfield_sets(record, "247", "10"):
        node = {}
        if sset.get("a"):
            node["preferredName"] = sset["a"]
        if sset.get("f"):
            node["disambiguatingDescription"] = sset["f"]
        if node:
            former.append(node)
    if former:
        title["formerTitles"] = former

    # uniform titles (130/240/700/710/711/730)
    uniform: list = []
    for tag in ("130", "240", "700", "710", "711", "730"):
        for sset in subfield_sets(record, tag, "*"):
            node = {}
            if sset.get("a") and tag in ("130", "240", "730"):
                node["preferredName"] = sset["a"]
            if sset.get("t") and tag in ("700", "710", "711"):
                node["preferredName"] = sset["t"]
            if not node.get("preferredName"):
                continue
            if sset.get("0"):
                same_as = authority_uri(sset["0"])
                if same_as is None:
                    # reference: enumerate(None) → TypeError → record drop
                    raise TypeError("unresolvable uniform-title $0 (namings.py:277-280)")
                # in-place delete while enumerating — replicates the
                # index-skipping behavior of namings.py:278-280
                if isinstance(same_as, list):
                    for n, uri in enumerate(same_as):
                        if not uri:
                            del same_as[n]
                node["sameAs"] = same_as
                if isinstance(node["sameAs"], str):
                    node["sameAs"] = [node["sameAs"]]
                if node["sameAs"]:
                    for uri in node["sameAs"]:
                        if isinstance(uri, str) and uri.startswith(config.base_id):
                            node["@id"] = mint_uri(uri.split(config.base_id)[1], "works", config)
            if node:
                uniform.append(node)
    if uniform:
        title["uniformTitles"] = uniform

    return title or None
