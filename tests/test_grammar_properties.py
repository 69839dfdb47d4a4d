"""Property-based pinning of the dual triple grammars (hypothesis)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_creation_from_text_with_llms_ray.functions.grammar import (
    extract_triples_from_response,
    format_triple_line,
    parse_response_lines,
    parse_triple_line,
)

# Components without quotes/commas/parens/semicolons — the class the
# write grammar handles losslessly (everything else is dropped or
# mangled by design parity with the reference).
_safe = st.text(
    alphabet=string.ascii_letters + string.digits + " _.-",
    min_size=1,
    max_size=30,
).map(str.strip).filter(
    lambda s: s and not s[0].isdigit() and not set(s) & set('(),;"')
    and s == s.strip()
)


@settings(max_examples=200, deadline=None)
@given(_safe, _safe, _safe)
def test_format_then_read_is_identity(s, p, o):
    assert parse_triple_line(format_triple_line(s, p, o)) == (s, p, o)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_safe, _safe, _safe), min_size=0, max_size=8))
def test_response_round_trip(triples):
    response = "\n".join(f"{i}. ({s}, {p}, {o})" for i, (s, p, o) in enumerate(triples, 1))
    assert extract_triples_from_response(response) == list(triples)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_parsers_never_crash_on_garbage(garbage):
    parse_response_lines(garbage)
    parse_triple_line(garbage)
    extract_triples_from_response(garbage)
