"""Compatibility exporters: Turtle graph, matched-triples YAML,
property-matches reports.

Driver-side utilities over small final tables (NOT Dataset stages) —
they reproduce the reference's file outputs so downstream consumers of
the original repo can keep reading the same artifacts:

* Turtle ← ``GraphManager.save_graph`` (``GraphManager.py:93-106``),
* ``matched_triples.yaml`` ← ``Integrator._save_matches``
  (``Integrator.py:355-379``),
* ``{predicate}_matches.txt`` ← ``Matcher.save_property_matches``
  (``Matcher.py:258-290``).
"""

from __future__ import annotations

import os
from urllib.parse import quote

import pyarrow as pa
import yaml

from .functions.minting import WD, WDT


def _ttl_escape(text: str) -> str:
    return (
        text.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")
    )


def edges_to_turtle(edges: pa.Table) -> str:
    """Serialize an edges table to Turtle with the reference's
    namespaces bound (``wd:``/``wdt:``, ``GraphManager.py:25-30``)."""
    lines = [
        "@prefix wd: <http://www.wikidata.org/entity/> .",
        "@prefix wdt: <http://www.wikidata.org/prop/direct/> .",
        "",
    ]

    def term(uri: str) -> str:
        if uri.startswith(WD):
            local = uri[len(WD):]
            if local.replace("_", "").isalnum() and " " not in local:
                return f"wd:{local}"
        if uri.startswith(WDT):
            local = uri[len(WDT):]
            if local.replace("_", "").isalnum() and " " not in local:
                return f"wdt:{local}"
        return f"<{uri}>"

    for s, p, o, lit in zip(
        edges["subject_id"].to_pylist(),
        edges["predicate_id"].to_pylist(),
        edges["object_id"].to_pylist(),
        edges["is_literal"].to_pylist(),
    ):
        obj = f'"{_ttl_escape(o)}"' if lit else term(o)
        lines.append(f"{term(s)} {term(p)} {obj} .")
    return "\n".join(lines) + "\n"


def write_turtle(edges: pa.Table, output_file: str) -> None:
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "w", encoding="utf-8") as f:
        f.write(edges_to_turtle(edges))


def linked_to_matches_yaml(linked: pa.Table) -> str:
    """Render linked triples in the reference's ``matched_triples.yaml``
    shape (``Integrator.py:128-142``): surface triple + resolved ids
    with the ``'not_found'`` sentinel for unresolved."""
    records = []
    for s, p, o, sid, pid, oid in zip(
        linked["subject"].to_pylist(),
        linked["predicate"].to_pylist(),
        linked["object"].to_pylist(),
        linked["subject_id"].to_pylist(),
        linked["predicate_id"].to_pylist(),
        linked["object_id"].to_pylist(),
    ):
        records.append(
            {
                "triple": {"subject": s, "predicate": p, "object": o},
                "expected_id": {
                    "subject": sid or "not_found",
                    "predicate": pid or "not_found",
                    "object": oid or "not_found",
                },
            }
        )
    return yaml.safe_dump(
        {"triples": records}, allow_unicode=True, default_flow_style=False, sort_keys=False
    )


def write_matches_yaml(linked: pa.Table, output_file: str) -> None:
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "w", encoding="utf-8") as f:
        f.write(linked_to_matches_yaml(linked))


def write_property_matches(
    predicate: str, matches: list[dict], output_dir: str
) -> str:
    """One ``{quoted_predicate}_matches.txt`` report per predicate in
    the reference's exact format (``Matcher.py:272-285``)."""
    os.makedirs(output_dir, exist_ok=True)
    safe = quote(predicate.replace(" ", "_"))
    path = os.path.join(output_dir, f"{safe}_matches.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f'Top matches for predicate: "{predicate}"\n')
        f.write("=" * 50 + "\n\n")
        for i, m in enumerate(matches, 1):
            f.write(f"{i}. Match Details:\n")
            f.write(f"   Property ID: {m['property_id']}\n")
            f.write(f"   Label: {m['label']}\n")
            f.write(f"   Similarity Score: {m['similarity']:.4f}\n")
            f.write("\n")
    return path
