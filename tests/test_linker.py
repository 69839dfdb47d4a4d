"""Linker semantics (SURVEY.md §5.2.3): exact-label > alias >
first-result preference, method dispatch incl. mixed fallback, top-10
stable ordering, URI minting rules incl. Q/P prefix detection and the
literal fallback."""

import numpy as np
import pytest

from knowledge_graph_creation_from_text_with_llms_ray.functions.embedding import encode_batch
from knowledge_graph_creation_from_text_with_llms_ray.functions.minting import (
    mint_edge,
    mint_entity_uri,
    mint_property_uri,
)
from knowledge_graph_creation_from_text_with_llms_ray.sources.alias_dict import (
    ResolvedDict,
    build_fixture_dict,
)
from knowledge_graph_creation_from_text_with_llms_ray.stages.link import LinkerActor


@pytest.fixture(scope="module")
def rd():
    return ResolvedDict(build_fixture_dict())


def test_exact_label_case_insensitive(rd):
    assert rd.resolve("entity", "Class0") == "Q100"
    assert rd.resolve("entity", "class0") == "Q100"
    assert rd.resolve("entity", "CLASS0") == "Q100"


def test_label_beats_alias(rd):
    # "table" is both the label of Q602 and an alias of Q777 (DataTable);
    # the label row must win (Matcher.py:72-92 preference).
    assert rd.resolve("entity", "table") == "Q602"
    # but a surface matching only the alias resolves through it
    assert rd.resolve("entity", "data table") == "Q777"


def test_unresolved_is_none(rd):
    assert rd.resolve("entity", "definitely_not_in_dict_xyz") is None
    assert rd.resolve("property", "no such property") is None


def test_property_alias_resolution(rd):
    assert rd.resolve("property", "extends") == "P279"
    assert rd.resolve("property", "inherits from") == "P279"
    assert rd.resolve("property", "written by") == "P50"


def test_method_dispatch_invalid():
    with pytest.raises(ValueError):
        LinkerActor(build_fixture_dict(), method="bogus")


def test_api_method_returns_none_on_miss():
    actor = LinkerActor(build_fixture_dict(), method="api")
    assert actor._resolve_properties(["completely unknown rel"]) == [None]


def test_cos_method_always_answers():
    actor = LinkerActor(build_fixture_dict(), method="cos_similarity")
    [pid] = actor._resolve_properties(["extendz"])  # near-miss of "extends"
    assert pid is not None


def test_mixed_prefers_exact_then_falls_back():
    actor = LinkerActor(build_fixture_dict(), method="mixed")
    exact, fuzzy = actor._resolve_properties(["extends", "extendz"])
    assert exact == "P279"
    assert fuzzy is not None


def test_topk_is_stable_and_bounded(rd):
    vecs = encode_batch(["depends on"])
    [matches] = rd.top_k_properties(vecs, k=10)
    assert len(matches) <= 10
    sims = [m[2] for m in matches]
    assert sims == sorted(sims, reverse=True)
    assert matches[0][0] == "P3"  # exact text match has cosine 1.0
    assert matches[0][2] == pytest.approx(1.0, abs=1e-5)


def test_embeddings_unit_norm():
    v = encode_batch(["hello world", "x"])
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_minting_rules():
    # GraphManager.py:48-55 parity
    assert mint_entity_uri("Q42") == "http://www.wikidata.org/entity/Q42"
    assert mint_entity_uri("Queen Anne") == "http://www.wikidata.org/entity/Queen Anne"
    assert mint_entity_uri("my thing") == "http://example.org/entity/my%20thing"
    assert mint_property_uri("P31") == "http://www.wikidata.org/prop/direct/P31"
    assert (
        mint_property_uri("is located In")
        == "http://example.org/property/is_located_in"
    )


def test_mint_edge_literal_fallback():
    s, p, o, lit = mint_edge("X", "rel y", "free text", None, None, None)
    assert s == "http://example.org/entity/X"
    assert p == "http://example.org/property/rel_y"
    assert o == "free text" and lit is True
    s, p, o, lit = mint_edge("X", "rel", "Y", "Q1", "P1", "Q2")
    assert o == "http://www.wikidata.org/entity/Q2" and lit is False
