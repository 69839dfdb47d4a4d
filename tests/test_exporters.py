import os

import pyarrow as pa
import yaml

from knowledge_graph_creation_from_text_with_llms_ray.exporters import (
    edges_to_turtle,
    linked_to_matches_yaml,
    write_property_matches,
)


EDGES = pa.table(
    {
        "subject_id": [
            "http://www.wikidata.org/entity/Q42",
            "http://example.org/entity/foo",
        ],
        "predicate_id": [
            "http://www.wikidata.org/prop/direct/P31",
            "http://example.org/property/rel_x",
        ],
        "object_id": ["http://www.wikidata.org/entity/Q5", 'literal "quoted"'],
        "is_literal": [False, True],
    }
)


def test_turtle_export():
    ttl = edges_to_turtle(EDGES)
    assert "@prefix wd: <http://www.wikidata.org/entity/> ." in ttl
    assert "wd:Q42 wdt:P31 wd:Q5 ." in ttl
    assert '<http://example.org/entity/foo> <http://example.org/property/rel_x> "literal \\"quoted\\"" .' in ttl


def test_matches_yaml_shape_matches_reference():
    linked = pa.table(
        {
            "subject": ["Alice"],
            "predicate": ["authored by"],
            "object": ["nowhere"],
            "subject_id": ["Q500"],
            "predicate_id": ["P50"],
            "object_id": [None],
        }
    )
    doc = yaml.safe_load(linked_to_matches_yaml(linked))
    # exact record shape of Integrator.py:128-142
    assert doc == {
        "triples": [
            {
                "triple": {"subject": "Alice", "predicate": "authored by", "object": "nowhere"},
                "expected_id": {"subject": "Q500", "predicate": "P50", "object": "not_found"},
            }
        ]
    }


def test_property_matches_report(tmp_path):
    path = write_property_matches(
        "depends on",
        [
            {"property_id": "P3", "label": "depends on", "similarity": 1.0},
            {"property_id": "P279", "label": "extends", "similarity": 0.5},
        ],
        str(tmp_path),
    )
    assert os.path.basename(path) == "depends_on_matches.txt"
    body = open(path).read()
    assert body.startswith('Top matches for predicate: "depends on"\n' + "=" * 50)
    assert "   Property ID: P3\n" in body
    assert "   Similarity Score: 1.0000\n" in body
