"""HTML boilerplate-stripping heuristics (engine/html_extract.py)."""

from docling_service_spark.engine.html_extract import extract_html_blocks

LONG = "This paragraph carries genuinely long main content text that should survive. " * 2


def kinds(blocks):
    return [k for k, _, _ in blocks]


def texts(blocks):
    return [t for _, t, _ in blocks]


def test_main_article_kept_boilerplate_dropped():
    html = f"""
    <html><body>
      <nav><ul><li><a href='/'>Home</a></li><li><a href='/b'>Blog</a></li></ul></nav>
      <div class="sidebar"><p><a href='/x'>x</a> <a href='/y'>y</a> <a href='/z'>z</a></p></div>
      <article>
        <h1>The Real Title</h1>
        <p>{LONG}</p>
        <ul><li>A meaningful bullet item with enough text.</li></ul>
        <pre>print("hi")</pre>
        <figcaption>Figure 1: a caption</figcaption>
      </article>
      <div id="ad-banner"><p>Buy now! {LONG}</p></div>
      <footer><p>Copyright · <a href='/t'>Terms</a> · <a href='/p'>Privacy</a></p></footer>
    </body></html>"""
    blocks = extract_html_blocks(html)
    assert kinds(blocks) == ["heading", "text", "list_item", "code", "caption"]
    assert blocks[0] == ("heading", "The Real Title", 1)
    assert blocks[1][1].startswith("This paragraph carries")


def test_link_density_drops_link_farms():
    html = (
        "<div><p>"
        + " ".join(f"<a href='/{i}'>related article {i}</a>" for i in range(10))
        + "</p></div>"
    )
    assert extract_html_blocks(html) == []


def test_long_text_tolerates_moderate_links():
    html = f"<p>{LONG} see <a href='/ref'>this reference</a> for details.</p>"
    blocks = extract_html_blocks(html)
    assert len(blocks) == 1 and blocks[0][0] == "text"


def test_short_fragments_dropped():
    assert extract_html_blocks("<p>too short</p>") == []
    assert extract_html_blocks("<p></p><div></div>") == []


def test_script_style_never_leak():
    html = f"<body><script>var x = 'SECRET_{ 'A'*40 }';</script><style>p {{color:red}}</style><p>{LONG}</p></body>"
    blocks = extract_html_blocks(html)
    assert len(blocks) == 1
    assert "SECRET" not in blocks[0][1]


def test_heading_levels():
    html = "<h1>Top Heading</h1><h3>Sub Heading</h3>"
    blocks = extract_html_blocks(html)
    assert blocks == [("heading", "Top Heading", 1), ("heading", "Sub Heading", 3)]


def test_nested_boilerplate_class_tokens():
    html = f"<div class='main-nav-wrapper'><p>{LONG}</p></div><p>{LONG}</p>"
    blocks = extract_html_blocks(html)
    assert len(blocks) == 1  # nav-classed container dropped wholesale


def test_malformed_html_is_lenient():
    # Unclosed tags must not raise; browsers are lenient, so are we.
    blocks = extract_html_blocks(f"<div><p>{LONG}")
    assert len(blocks) == 1


def test_whitespace_normalization():
    html = f"<p>  {LONG.split('.')[0]}   with\n\n   spans\tof   whitespace everywhere.  </p>"
    blocks = extract_html_blocks(html)
    assert "  " not in blocks[0][1]
    assert not blocks[0][1].startswith(" ")
