"""Differential tests: the fast HTML tokenizer must agree with the stdlib
parser everywhere the corpus (and reasonable markup) lives."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from docling_service_spark.corpus import build_doc
from docling_service_spark.engine.html_extract import extract_html_blocks


def both(fragment: str):
    return (extract_html_blocks(fragment),
            extract_html_blocks(fragment, force_stdlib=True))


def test_parity_over_corpus_html():
    checked = 0
    for idx in range(0, 400):
        doc = build_doc(idx)
        for span in doc["spans"]:
            if span["kind"] == "html":
                fast, std = both(span["text"])
                assert fast == std, f"divergence at doc {idx}"
                checked += 1
    assert checked > 100


def test_parity_on_tricky_markup():
    cases = [
        "<p>entity &amp; test &lt;tag&gt; &#1090;&#1077;ст here padded to len</p>",
        "<div CLASS='sidebar'><p>upper-case attr names should still boilerplate</p></div>",
        '<div class="a-nav-b"><p>hyphenated boilerplate token list here ok</p></div>',
        "<script>var x = '<p>not a paragraph</p>';</script><p>Real content paragraph survives here.</p>",
        "<style>p:before { content: '<div>'; }</style><p>Another real content paragraph right here.</p>",
        "<!-- comment with <p>tag</p> inside --><p>Paragraph after a tricky comment block.</p>",
        "<!DOCTYPE html><html><body><p>Doc with doctype keeps working as expected fine.</p></body></html>",
        "<p>self-closing imgs <img src='x'/> and breaks<br>inside a long enough paragraph body</p>",
        "<ul><li>first item long enough to keep</li><li>second item long enough to keep</li></ul>",
        "<h1></h1><p></p><div></div>",
        "<p>unclosed paragraph that keeps going and going with plenty of length",
        "<textarea><p>should be raw text</p></textarea><p>Visible paragraph after the textarea.</p>",
        '<div title="a>b"><p>Quoted gt inside attribute with enough paragraph length.</p></div>',
        "<div title='a>b'><p>Single-quoted gt attr with enough paragraph length too.</p></div>",
        '<p class="x>y">Paragraph whose own attr contains a quoted greater-than sign.</p>',
    ]
    for html in cases:
        fast, std = both(html)
        assert fast == std, f"divergence on: {html[:60]}"


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="<>/ab &;p=\"'x-!", max_size=60))
def test_fast_path_never_crashes_on_garbage(s):
    # No parity requirement on garbage (leniency may differ) — but the fast
    # path must return deterministically without raising.
    assert extract_html_blocks(s) == extract_html_blocks(s)


def test_hostile_quote_run_returns_fast():
    import time

    t0 = time.perf_counter()
    assert extract_html_blocks("<p " + '"' * 500) == []
    assert time.perf_counter() - t0 < 1.0  # was exponential backtracking


def test_rawtext_after_length_changing_unicode():
    # 'İ' lowercases to two chars; index math on a lowered copy silently
    # swallowed content after rawtext elements.
    frag = ("İ" * 30) + "<script>var x=1;</script><p>" + "Visible paragraph body here. " * 2 + "</p>"
    fast, std = both(frag)
    assert fast == std and len(fast) == 1
