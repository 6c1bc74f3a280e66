"""M9 render parity: rst/md/plain -> HTML, heading shift, HTML splitter.

Boundary cases ported from behavior of the reference's
``tests/test_description_splitter.py:282-392`` (title extraction,
starts-with-text exclusion, changelog routing) and
``plugins/rst_to_html.py`` (renderer table, h1->h2 shift, h6 cap).
"""

import pytest

from pyf_aggregator_ray.functions import rendering as rd
from pyf_aggregator_ray.functions.transforms import split_description_html


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------


def test_markdown_headings_and_inline():
    html = rd.render_markdown("# Title\n\nHello [x](http://u) `c`\n\n## Sub")
    assert html == (
        '<h1>Title</h1><p>Hello <a href="http://u">x</a> '
        "<code>c</code></p><h2>Sub</h2>"
    )


def test_markdown_fenced_code_escaped():
    html = rd.render_markdown("```\na < b & c\n```")
    assert html == "<pre><code>a &lt; b &amp; c</code></pre>"


def test_markdown_image():
    assert rd.render_markdown("![alt](http://i.png)") == (
        '<p><img alt="alt" src="http://i.png"></p>'
    )


def test_rst_adornment_order_sets_levels():
    src = "Top\n===\n\npara\n\nSection\n-------\n\nDeep\n~~~~\n\nNext\n----"
    html = rd.render_rst(src)
    assert "<h1>Top</h1>" in html
    assert "<h2>Section</h2>" in html
    assert "<h3>Deep</h3>" in html
    assert html.count("<h2>") == 2  # '-' style reused -> same level


def test_rst_inline_and_image():
    html = rd.render_rst(
        "Use ``func`` or `docs <http://d>`_.\n\n.. image:: http://i.png"
    )
    assert "<code>func</code>" in html
    assert '<a href="http://d">docs</a>' in html
    assert '<img src="http://i.png">' in html


def test_renderer_table_defaults_to_rst():
    # reference _RENDERERS: None/"" -> rst (rst_to_html.py:10-16)
    src = "Title\n=====\n\nbody"
    assert rd.render_description(src, None) == rd.render_rst(src)
    assert rd.render_description(src, "") == rd.render_rst(src)
    assert rd.render_description(src, "application/weird") == rd.render_rst(src)
    assert rd.render_description("x", "text/plain") == "<p>x</p>"


def test_shift_headings_and_cap():
    assert rd.shift_headings("<h1>A</h1><h2>B</h2><h6>C</h6>") == (
        "<h2>A</h2><h3>B</h3><h6>C</h6>"
    )
    assert rd.shift_headings("") == ""


# ---------------------------------------------------------------------------
# HTML splitter (reference boundary semantics)
# ---------------------------------------------------------------------------

SIMPLE = "<h2>Package Title</h2><p>A package description</p>"
MULTI = (
    "<h2>Package Title</h2><p>Introduction paragraph</p>"
    "<h2>Installation</h2><p>Install with pip</p>"
    "<h2>Usage</h2><p>Use it</p>"
)
STARTS_WITH_TEXT = (
    "<p>A helper package</p><h3>Features</h3><p>Feature list</p>"
    "<h3>Installation</h3><p>pip install</p>"
)
WITH_CHANGELOG = (
    "<p>package description</p><h3>Features</h3><p>Feature list</p>"
    "<h3>Changelog</h3><p>Version history</p>"
)


def test_title_is_plain_text_of_first_heading():
    assert split_description_html(SIMPLE)["title"] == "Package Title"
    r = split_description_html("<h2>Title with <code>bold</code> text</h2><p>c</p>")
    assert r["title"] == "Title with bold text"
    assert "<" not in r["title"]


def test_title_strips_whitespace():
    r = split_description_html("<h2>  Spaced Title  </h2><p>c</p>")
    assert r["title"] == "Spaced Title"


def test_no_headings_all_in_first_chapter_empty_title():
    r = split_description_html("<p>Just some content</p><p>Another paragraph</p>")
    assert r["title"] == ""
    assert "Just some content" in r["first_chapter"]
    assert "Another paragraph" in r["first_chapter"]
    assert r["main_content"] == "" and r["changelog"] == ""


def test_first_chapter_until_second_heading():
    r = split_description_html(MULTI)
    assert "Introduction paragraph" in r["first_chapter"]
    assert "Package Title" in r["first_chapter"]  # first heading included
    assert "Install with pip" not in r["first_chapter"]
    assert "Installation" in r["main_content"]
    assert "Use it" in r["main_content"]


def test_single_heading_everything_in_first_chapter():
    r = split_description_html(SIMPLE)
    assert "Package Title" in r["first_chapter"]
    assert "package description" in r["first_chapter"]
    assert r["main_content"] == ""


def test_starts_with_text_excludes_first_heading():
    r = split_description_html(STARTS_WITH_TEXT)
    assert "helper package" in r["first_chapter"]
    assert "Features" not in r["first_chapter"]
    assert "<h3>" not in r["first_chapter"]
    # main_content starts at the first heading; title still from it
    assert "Features" in r["main_content"]
    assert "Feature list" in r["main_content"]
    assert "Installation" in r["main_content"]
    assert r["title"] == "Features"


def test_starts_with_text_and_changelog():
    r = split_description_html(WITH_CHANGELOG)
    assert "package description" in r["first_chapter"]
    assert "Features" in r["main_content"]
    assert "Changelog" not in r["main_content"]
    assert "Changelog" in r["changelog"]
    assert "Version history" in r["changelog"]


@pytest.mark.parametrize(
    "heading", ["Changelog", "HISTORY", "Changes", "Release Notes", "What's New"]
)
def test_changelog_heading_variants(heading):
    html = f"<h2>Top</h2><p>intro</p><h2>{heading}</h2><p>entries</p>"
    r = split_description_html(html)
    assert "entries" in r["changelog"]
    assert "entries" not in r["main_content"]


def test_first_chapter_links_and_images_stripped():
    html = (
        '<h2>T</h2><p>See <a href="http://x">the docs</a>'
        '<img src="http://i.png"></p><h2>Next</h2><p>n</p>'
    )
    r = split_description_html(html)
    assert "the docs" in r["first_chapter"]
    assert "<a" not in r["first_chapter"]
    assert "<img" not in r["first_chapter"]


def test_empty_and_none():
    for v in (None, "", "   "):
        r = split_description_html(v)
        assert r == {
            "title": "", "first_chapter": "", "main_content": "", "changelog": "",
        }


def test_render_then_split_rst_end_to_end():
    """Full M9 path: rst -> html -> shift -> split, as the chain runs it."""
    src = (
        "mypkg\n=====\n\nIntro paragraph.\n\nUsage\n-----\n\n"
        "Call ``f``.\n\nChangelog\n---------\n\n- 1.0\n"
    )
    html = rd.shift_headings(rd.render_description(src, "text/x-rst"))
    assert "<h2>mypkg</h2>" in html  # h1 shifted
    r = split_description_html(html)
    assert r["title"] == "mypkg"
    assert "Intro paragraph." in r["first_chapter"]
    assert "Call" in r["main_content"]
    assert "1.0" in r["changelog"]


def test_shift_preserves_attributes_and_siblings():
    """Reference normalize_headings vectors (tests/test_rst_to_html.py:
    124-170): attributes ride along, non-heading elements untouched,
    entity-escaped heading content preserved."""
    from pyf_aggregator_ray.functions.rendering import shift_headings

    html = '<h1 id="main-title" class="title">Title</h1><h1 id="section">S</h1>'
    out = shift_headings(html)
    assert 'id="main-title"' in out and 'class="title"' in out
    assert "<h1" not in out and out.count("<h2") == 2

    html = "<h1>T</h1><p>Paragraph</p><ul><li>Item</li></ul><div>Content</div>"
    out = shift_headings(html)
    assert "<p>Paragraph</p>" in out
    assert "<li>Item</li>" in out
    assert "<div>Content</div>" in out

    out = shift_headings("<h1>Special Characters: &amp; &lt; &gt;</h1>")
    assert "Special Characters" in out and "&amp;" in out

    assert shift_headings("") == ""
    assert shift_headings(None) is None
    assert shift_headings("<p>no headings</p>") == "<p>no headings</p>"


def test_shift_multiple_h1_all_become_h2():
    # reference test_rst_to_html.py:90-97
    html = "<h1>First</h1><p>a</p><h1>Second</h1><p>b</p><h1>Third</h1>"
    out = rd.shift_headings(html)
    assert out.count("<h2>") == 3 and "<h1>" not in out


def test_shift_nested_structure_all_levels():
    # reference test_rst_to_html.py:98-107: every level shifts by one
    html = "<h1>T</h1><h2>S1</h2><h3>S1.1</h3><h2>S2</h2><h3>S2.1</h3><h4>D</h4>"
    out = rd.shift_headings(html)
    assert "<h2>T</h2>" in out
    assert out.count("<h3>") == 2 and out.count("<h4>") == 2
    assert "<h5>D</h5>" in out


def test_shift_handles_none_and_only_h1():
    # reference test_rst_to_html.py:73-82,171-179
    assert rd.shift_headings(None) in (None, "")
    assert rd.shift_headings("<h1>Lonely</h1>") == "<h2>Lonely</h2>"


def test_shift_preserves_non_heading_elements():
    # reference test_rst_to_html.py:144-151
    html = '<h1>T</h1><p>para</p><ul><li>item</li></ul><pre>code</pre>'
    out = rd.shift_headings(html)
    for frag in ("<p>para</p>", "<ul><li>item</li></ul>", "<pre>code</pre>"):
        assert frag in out
