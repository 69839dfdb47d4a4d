"""Canonical node / predicate id minting.

Replicates the reference's URI minting rules exactly
(``src/core/Integrator/GraphManager.py:48-55``):

* subject/object: ``wd:`` namespace iff the resolved id starts with
  ``Q``, else a local ``example.org/entity/`` URI with the surface text
  percent-quoted;
* predicate: ``wdt:`` namespace iff it starts with ``P``, else
  ``example.org/property/`` with ``lower().replace(' ', '_')`` then
  percent-quoted;
* the object is a plain literal (no URI) iff it could not be linked
  (``Integrator.py:149``).
"""

from __future__ import annotations

from urllib.parse import quote

WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"
LOCAL_ENTITY = "http://example.org/entity/"
LOCAL_PROPERTY = "http://example.org/property/"


def mint_entity_uri(entity_id_or_text: str) -> str:
    if entity_id_or_text.startswith("Q"):
        return WD + entity_id_or_text
    return LOCAL_ENTITY + quote(entity_id_or_text)


def mint_property_uri(property_id_or_text: str) -> str:
    if property_id_or_text.startswith("P"):
        return WDT + property_id_or_text
    return LOCAL_PROPERTY + quote(property_id_or_text.lower().replace(" ", "_"))


def mint_edge(
    subject: str,
    predicate: str,
    obj: str,
    subject_id: str | None,
    predicate_id: str | None,
    object_id: str | None,
) -> tuple[str, str, str, bool]:
    """(surface triple, resolved ids) → canonical edge columns.

    ``<resolved id> or <surface>`` fallback and ``is_literal = object
    unresolved`` per ``Integrator.py:144-150``.
    """
    subject_uri = mint_entity_uri(subject_id or subject)
    predicate_uri = mint_property_uri(predicate_id or predicate)
    is_literal = object_id is None
    if is_literal:
        object_uri = obj  # literal objects keep the raw surface text
    else:
        object_uri = mint_entity_uri(object_id or obj)
    return subject_uri, predicate_uri, object_uri, is_literal
