"""Parser conformance, pinned against the reference's own committed
fixtures (SURVEY.md §5.2.1): every ``chunk_N_response.txt`` fed through
the write grammar must reproduce the committed ``chunk_N_triples.txt``
byte-for-byte, and the read grammar must accept every committed triples
file."""

import glob
import os

import pytest

from knowledge_graph_creation_from_text_with_llms_ray.functions.grammar import (
    extract_triples_from_response,
    format_triple_line,
    normalize_text,
    parse_response_lines,
    parse_triple_line,
    parse_triples_text,
)

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)


def _response_fixture_pairs():
    pairs = []
    for root in ("tests/results/Generator", "Experiments_Results"):
        for resp in glob.glob(
            f"{REFERENCE}/{root}/**/chunk_*_response.txt", recursive=True
        ):
            triples = resp.replace("_response.txt", "_triples.txt")
            if os.path.exists(triples):
                pairs.append((resp, triples))
    return sorted(pairs)


@needs_reference
def test_write_grammar_reproduces_reference_triples_files():
    pairs = _response_fixture_pairs()
    assert pairs, "no reference response fixtures found"
    checked = 0
    for resp_path, triples_path in pairs:
        with open(resp_path, encoding="utf-8") as f:
            response = f.read()
        with open(triples_path, encoding="utf-8") as f:
            expected = f.read()
        got = "".join(
            format_triple_line(s, p, o) + "\n"
            for s, p, o in parse_response_lines(response)
        )
        assert got == expected, f"write-grammar mismatch for {resp_path}"
        checked += 1
    assert checked >= 10


@needs_reference
def test_read_grammar_parses_reference_integrator_fixtures():
    files = sorted(
        glob.glob(f"{REFERENCE}/src/data/Datasets_Integrator/**/*_triples.txt", recursive=True)
    )
    assert files
    total = 0
    for path in files:
        with open(path, encoding="utf-8") as f:
            text = f.read()
        triples = parse_triples_text(text)
        # every parsed triple has 3 non-degenerate components
        for t in triples:
            assert len(t) == 3
        non_blank = [
            l for l in text.splitlines() if l.strip() and not l.strip().startswith("#")
        ]
        # the reference files are machine-written → all lines well-formed
        assert len(triples) == len(non_blank), path
        total += len(triples)
    assert total > 100


def test_write_grammar_mechanics():
    resp = '1. (Eiffel Tower, is located in, Paris)\n2. (Paris, is in, France)\nnot a triple\n3. (a, b, c, d)'
    assert parse_response_lines(resp) == [
        ("Eiffel Tower", "is located in", "Paris"),
        ("Paris", "is in", "France"),
    ]
    # naive split drops quoted commas (write side is NOT quote-aware,
    # TripleGenerator.py:158)
    assert parse_response_lines('(a, "b, c", d)') == []
    # numbering strip eats digits/dots/spaces only at line start
    assert parse_response_lines("12. (x, y, z)") == [("x", "y", "z")]


def test_read_grammar_mechanics():
    assert parse_triple_line('("a", "b", "c");') == ("a", "b", "c")
    # quote-aware: commas inside quotes survive
    assert parse_triple_line('("a, x", "b", "c");') == ("a, x", "b", "c")
    assert parse_triple_line("# comment") is None
    assert parse_triple_line("") is None
    assert parse_triple_line('("a", "b");') is None
    # outer parens stripped greedily (str.strip semantics)
    assert parse_triple_line("(a, b, c)") == ("a", "b", "c")


def test_round_trip_composition():
    resp = "1. (Class1 extends Base2, extends, Base2)"
    # write grammar splits on ', ' → 3 parts? "Class1 extends Base2,
    # extends, Base2" → ['(Class1 extends Base2','extends','Base2)']…
    # exercised here to pin the exact behavior:
    assert extract_triples_from_response(resp) == [
        ("Class1 extends Base2", "extends", "Base2")
    ]
    assert extract_triples_from_response("") == []


def test_normalize_text():
    assert normalize_text("  Hello, World!  ") == "hello world"
    assert normalize_text("a_b-c") == "a_bc"
