"""Offline dictionary-artifact builder: SPARQL fetch → grouped rows →
parquet (the live side of S8, reference
``src/core/Integrator/WikidataEmbeddingGenerator.py:26-29,63-64,107-112``).

The network call is isolated behind ``fetch_sparql_json`` (urllib, no
extra deps) and everything after it is pure and unit-testable: a canned
SPARQL JSON response drives ``parse_sparql_bindings`` →
``build_dict_from_rows`` → parquet.  In the sandbox (no network) use
``--from-json`` with a saved response.

CLI:
    python -m knowledge_graph_creation_from_text_with_llms_ray.sources.wikidata_fetch \\
        --out /tmp/dict.parquet [--simple] [--from-json response.json] \\
        [--endpoint https://query.wikidata.org/sparql]
"""

from __future__ import annotations

import argparse
import json
import sys

# The reference's property queries verbatim (simple = labels only,
# aliased = labels + english altLabels).
SPARQL_PROPERTIES_SIMPLE = """
SELECT ?property ?propertyLabel
WHERE {
  ?property a wikibase:Property .
  SERVICE wikibase:label {
    bd:serviceParam wikibase:language "en" .
    ?property rdfs:label ?propertyLabel .
  }
}
"""

SPARQL_PROPERTIES_ALIASES = """
SELECT ?property ?propertyLabel ?altLabel
WHERE {
  ?property a wikibase:Property .
  SERVICE wikibase:label {
    bd:serviceParam wikibase:language "en" .
    ?property rdfs:label ?propertyLabel .
  }
  OPTIONAL {
    ?property skos:altLabel ?altLabel .
    FILTER(LANG(?altLabel) = "en")
  }
}
"""


def fetch_sparql_json(
    query: str,
    endpoint: str = "https://query.wikidata.org/sparql",
    timeout: int = 300,
    user_agent: str = "kgray-dict-builder/1.0",
) -> dict:  # pragma: no cover - requires network
    """Run a SPARQL query, return the standard SPARQL-JSON result.
    Network-gated: any socket/urllib failure surfaces as a clear
    RuntimeError so offline runs know to use ``--from-json``."""
    import urllib.error
    import urllib.parse
    import urllib.request

    url = endpoint + "?" + urllib.parse.urlencode(
        {"query": query, "format": "json"}
    )
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"SPARQL fetch failed ({e}); no network?  Re-run with "
            "--from-json <saved-response.json>"
        ) from e


def parse_sparql_bindings(results: dict, kind: str = "property") -> list[dict]:
    """SPARQL-JSON bindings → flat (id, kind, label, alias, ord) rows.

    Mirrors the reference's grouping (``WikidataEmbeddingGenerator.py:
    115-131``): one label per property (first seen wins), aliases in
    result order; ``ord`` preserves that order through the groupby in
    ``build_dict_from_rows``.  Alias rows repeat the label row's label
    (the group assembler reads it from any row)."""
    labels: dict[str, str] = {}
    aliases: dict[str, list[str]] = {}
    for b in results.get("results", {}).get("bindings", []):
        uri = b.get("property", {}).get("value", "")
        pid = uri.split("/")[-1]
        if not pid:
            continue
        label = b.get("propertyLabel", {}).get("value", "")
        labels.setdefault(pid, label)
        alt = b.get("altLabel", {}).get("value")
        if alt is not None:
            bucket = aliases.setdefault(pid, [])
            if alt not in bucket:
                bucket.append(alt)
    rows = []
    for pid, label in labels.items():
        rows.append(
            {"id": pid, "kind": kind, "label": label, "alias": label, "ord": 0}
        )
        for i, alt in enumerate(aliases.get(pid, []), start=1):
            rows.append(
                {"id": pid, "kind": kind, "label": label, "alias": alt, "ord": i}
            )
    return rows


def build_artifact(rows: list[dict], out_path: str) -> int:
    """rows → distributed groupby assembly → parquet artifact.
    Returns the number of (id, alias) rows written."""
    import ray.data

    from .alias_dict import build_dict_from_rows, write_dict

    ds = ray.data.from_items(rows)
    table = build_dict_from_rows(ds)
    write_dict(out_path, table)
    return table.num_rows


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--endpoint", default="https://query.wikidata.org/sparql")
    ap.add_argument(
        "--simple", action="store_true", help="labels only (no aliases)"
    )
    ap.add_argument(
        "--from-json",
        default=None,
        help="use a saved SPARQL JSON response instead of fetching",
    )
    args = ap.parse_args(argv)
    if args.from_json:
        with open(args.from_json, encoding="utf-8") as f:
            results = json.load(f)
    else:  # pragma: no cover - requires network
        query = (
            SPARQL_PROPERTIES_SIMPLE if args.simple else SPARQL_PROPERTIES_ALIASES
        )
        results = fetch_sparql_json(query, endpoint=args.endpoint)
    rows = parse_sparql_bindings(results)
    n = build_artifact(rows, args.out)
    print(f"wrote {n} dictionary rows to {args.out}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
