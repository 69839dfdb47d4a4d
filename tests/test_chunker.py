"""Chunker conformance (SURVEY.md §5.2.2): greedy packing boundaries
around chunk_size, including the ``+1`` separator accounting
(Extractor.py:80), the kept final partial chunk (:86-87), and the
empty-first-chunk quirk for oversized leading sentences."""

from knowledge_graph_creation_from_text_with_llms_ray.functions.chunking import (
    chunk_text,
    pack_chunks,
    split_sentences,
)


def test_split_sentences():
    assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert split_sentences("") == []
    assert split_sentences("   ") == []
    assert split_sentences("no terminal punctuation") == ["no terminal punctuation"]


def test_pack_exact_boundary():
    # len("aaaa")=4; 4+4+1=9 <= 9 → both packed into one chunk
    assert pack_chunks(["aaaa", "bbbb"], 9) == ["aaaa bbbb"]
    # 4+4+1=9 > 8 → split
    assert pack_chunks(["aaaa", "bbbb"], 8) == ["aaaa", "bbbb"]


def test_first_sentence_counts_separator_too():
    # Reference quirk: even the first sentence is tested with +1, so a
    # sentence of exactly chunk_size chars does NOT fit an empty chunk.
    assert pack_chunks(["aaaa"], 4) == ["", "aaaa"]
    assert pack_chunks(["aaaa"], 5) == ["aaaa"]


def test_final_partial_chunk_kept():
    assert pack_chunks(["aaaa", "bbbb", "cc"], 9) == ["aaaa bbbb", "cc"]


def test_oversized_leading_sentence_emits_empty_chunk():
    assert pack_chunks(["x" * 100, "yy"], 10) == ["", "x" * 100, "yy"]


def test_chunk_text_strips():
    # strip applied at materialization (Extractor.py:101)
    out = chunk_text("A b. C d.", 6)
    assert out == ["A b.", "C d."]
    assert chunk_text("", 100) == []


def test_split_sentences_punkt_parity_on_real_prose():
    """The round-1 review's divergence cases (abbreviations, initials,
    decimals, acronyms) against hand-derived punkt-convention splits."""
    text = (
        "Dr. Smith went to Washington. He arrived at 3.30 p.m. on Jan. 5 "
        "with Prof. J. Jones. The U.S. economy grew 3.5 percent. "
        "Results (e.g. tables) follow! Is that all? Yes."
    )
    assert split_sentences(text) == [
        "Dr. Smith went to Washington.",
        "He arrived at 3.30 p.m. on Jan. 5 with Prof. J. Jones.",
        "The U.S. economy grew 3.5 percent.",
        "Results (e.g. tables) follow!",
        "Is that all?",
        "Yes.",
    ]


def test_split_sentences_decimals_and_ellipsis():
    assert split_sentences("Pi is 3.14159 exactly. Almost.") == [
        "Pi is 3.14159 exactly.",
        "Almost.",
    ]
    assert split_sentences("Wait... Done. Hm?!") == ["Wait...", "Done.", "Hm?!"]


def test_split_sentences_abbreviation_never_splits():
    # abbreviation followed by a capitalized word still does not split
    assert split_sentences("See Fig. 3 and Dr. Brown. End.") == [
        "See Fig. 3 and Dr. Brown.",
        "End.",
    ]
