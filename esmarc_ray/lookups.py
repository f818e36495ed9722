"""Broadcast lookup constants.

Loaded once per process from ``esmarc_ray/data/lookups.json`` (extracted from
the reference's data tables by ``tools/extract_lookups.py``; provenance:
reference esmarc/lookup_tables/*.py, ~3.1k LoC of pure dicts).

All tables together are well under 1 MB — small enough to ship inside the
serialized batch-function closure to every Ray task; no ``ray.put`` needed
(Ray caches the deserialized function per worker process, so the JSON parse
happens once per worker, not once per batch).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

_DATA_PATH = pathlib.Path(__file__).resolve().parent / "data" / "lookups.json"

_tables: dict[str, Any] = json.loads(_DATA_PATH.read_text())

# 079$b -> entity class (reference lookup_tables/entities.py:1-9)
ENTITY_BY_CODE: dict[str, str] = _tables["entity_by_code"]
# 079$b / $D -> schema.org type (entities.py:11-19)
SCHEMA_TYPE_BY_CODE: dict[str, str] = _tables["schema_type_by_code"]
# $D -> mention @type (entities.py:21-29)
MENTION_TYPE_BY_CODE: dict[str, str] = _tables["mention_type_by_code"]
# 6XX tag -> mention @type/@id template (entities.py:31-47)
MENTION_FIELD_MAP: dict[str, dict] = _tables["mention_field_map"]
# "(DE-588)" etc. -> {@id prefix, publisher node} (lookup_tables/sameAs.py)
ISIL_AUTHORITIES: dict[str, dict] = _tables["isil_authorities"]
# urn/hdl/doi -> resolver URI prefix (lookup_tables/identifiers.py)
IDENTIFIER_URI_PREFIXES: dict[str, str] = _tables["identifier_uri_prefixes"]
# classification scheme stencils (lookup_tables/classifications.py)
CLASSIFICATION_SCHEMES: dict[str, dict] = _tables["classification_schemes"]
# 084 SSG/FID + 935 collection code labels (lookup_tables/collections.py)
SSG_FID_LABELS: dict[str, str] = _tables["ssg_fid_labels"]
COLLECTION_LABELS: dict[str, str] = _tables["collection_labels"]
# footnote field -> type/submap (lookup_tables/footnotes.py)
FOOTNOTE_TYPES: dict[str, dict] = _tables["footnote_types"]
# ISO-639-2 code -> {en,de} labels; k10plus -> iso remap (lookup_tables/language.py)
LANGUAGE_LABELS: dict[str, dict] = _tables["language_labels"]
K10PLUS_TO_ISO: dict[str, str] = _tables["k10plus_to_iso"]
# 751$4 -> place role label (lookup_tables/publisher.py)
PLACE_ROLES: dict[str, str] = _tables["place_roles"]
# $9 / $4 code -> relation predicate (lookup_tables/relatedTo.py)
RELATION_BY_CODE: dict[str, str] = _tables["relation_by_code"]
# MARC relator code -> German / English role labels (lookup_tables/roles.py)
ROLE_LABELS_DE: dict[str, str] = _tables["role_labels_de"]
ROLE_LABELS_EN: dict[str, str] = _tables["role_labels_en"]
