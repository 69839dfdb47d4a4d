from knowledge_graph_creation_from_text_with_llms_ray.functions.textprep import (
    content_to_text,
    html_to_text,
    module_name_from_path,
)


def test_module_name():
    assert module_name_from_path("src/mod_1/file_7.py") == "file_7"
    assert module_name_from_path("README") == "README"


def test_python_extraction():
    content = '\n'.join(
        [
            '"""ClassA extends BaseB. It is documented."""',
            "# file_1 authored by Alice.",
            "import util_core",
            "from util_3 import thing",
            "class ClassA(BaseB):",
            "    pass",
        ]
    )
    text = content_to_text(content, "python", "file_1")
    assert "ClassA extends BaseB." in text
    assert "file_1 authored by Alice." in text
    assert "file_1 imports util_core." in text
    assert "file_1 imports util_3." in text
    assert "class ClassA" not in text  # code body is not prose


def test_java_extraction():
    content = "\n".join(
        [
            "/** ClassX extends BaseY. */",
            "// file_2 calls Helper.",
            "import util.core;",
            "public class ClassX {}",
        ]
    )
    text = content_to_text(content, "java", "file_2")
    assert "ClassX extends BaseY." in text
    assert "file_2 calls Helper." in text
    assert "file_2 imports util.core." in text


def test_html_cleaning_matches_reference_semantics():
    html = (
        "<html><head><title>T</title></head><body>"
        "<p>First <b>para</b>.</p>"
        "<table><tr><td><p>inside table dropped</p></td></tr></table>"
        '<p>Cited<sup class="reference">[1]</sup> text.</p>'
        "<div>not a paragraph</div>"
        "<p>Last.</p></body></html>"
    )
    text = html_to_text(html)
    assert text == "First para. Cited text. Last."
    assert content_to_text(html, "html", "page") == "First para. Cited text. Last."


def test_plain_text_passthrough_collapses_whitespace():
    assert content_to_text("a  b\nc\t d ", "text", "m") == "a b c d"


def test_html_malformed_markup_tolerated():
    """The failure modes of a regex-only parser: unclosed tags, nested
    tables, implicit <p> closes, entities."""
    html = (
        "<html><body>"
        "<p>First &amp; <b>bold</b> paragraph"      # unclosed <p>, entity
        "<p>Second paragraph.</p>"                   # implicit close of first
        "<table><tr><td>drop<table><tr><td>nested</td></tr></table></td></tr>"
        "</table>"                                   # nested table, all dropped
        "<p>Third<sup class='x reference y'>[1]</sup> paragraph.</p>"
        "</body></html>"
    )
    assert html_to_text(html) == (
        "First & bold paragraph Second paragraph. Third paragraph."
    )


def test_html_table_inside_paragraph_dropped():
    html = "<p>keep <table><tr><td>drop me</td></tr></table> this</p>"
    assert html_to_text(html) == "keep  this"


def test_html_unclosed_table_suppresses_rest():
    # bs4 parses an unclosed <table> as wrapping the remainder; the
    # paragraph inside it is decomposed with the table
    html = "<p>ok</p><table><tr><td><p>gone</p>"
    assert html_to_text(html) == "ok"
