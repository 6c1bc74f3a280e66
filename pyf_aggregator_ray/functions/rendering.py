"""rst/md/plain -> HTML rendering + heading normalization (SURVEY M9).

Behavioral reimplementation of the reference's rst_to_html plugin
(``/root/reference/src/pyf/aggregator/plugins/rst_to_html.py:10-85``):
render the description by ``description_content_type`` (default rst for
``None``/``""``), then shift every heading down one level (h1->h2,
capped at h6 — the UI owns the page h1). The reference renders through
``readme_renderer``/``lxml``, which aren't in this container; the
renderers here cover the markdown/rst/plain subset the fixtures and
tests exercise and emit flat, well-formed block-level HTML that
``functions.transforms.split_description_html`` re-parses. Swapping in a
real renderer changes only this module.

Supported subset:
* markdown — ATX headings (``#`` .. ``######``), fenced code blocks,
  paragraphs; inline images ``![alt](url)``, links ``[text](url)``,
  code spans ``` `x` ```.
* rst — underlined section titles (adornment style order determines the
  heading level, as docutils assigns them), ``.. image:: url``
  directives, paragraphs; inline ````literal```` and
  ```text <url>`_`` links.
* plain text — escaped paragraphs.
"""

from __future__ import annotations

import html as _html
import re

_MD_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_MD_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)[^)]*\)")
_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)\s]+)[^)]*\)")
_MD_CODE_RE = re.compile(r"`([^`]+)`")

_RST_ADORNMENT_RE = re.compile(r"^([=\-`:'\"~^_*+#<>.])\1{1,}\s*$")
_RST_IMAGE_RE = re.compile(r"^\.\.\s+image::\s+(\S+)\s*$")
_RST_LITERAL_RE = re.compile(r"``([^`]+)``")
# applied AFTER escape(): the rst `text <url>`_ form arrives with the
# angle brackets entity-escaped
_RST_LINK_RE = re.compile(r"`([^`]+?)\s+&lt;(.+?)&gt;`_")


def escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _md_inline(text: str) -> str:
    text = _MD_IMAGE_RE.sub(r'<img alt="\1" src="\2">', text)
    text = _MD_LINK_RE.sub(r'<a href="\2">\1</a>', text)
    return _MD_CODE_RE.sub(r"<code>\1</code>", text)


def render_markdown(text: str) -> str:
    out: list[str] = []
    para: list[str] = []
    in_fence = False
    fence: list[str] = []

    def flush_para() -> None:
        if para:
            out.append(f"<p>{_md_inline(escape(' '.join(para)))}</p>")
            para.clear()

    for line in text.splitlines():
        if line.strip().startswith("```"):
            if in_fence:
                out.append(f"<pre><code>{escape(chr(10).join(fence))}</code></pre>")
                fence.clear()
            else:
                flush_para()
            in_fence = not in_fence
            continue
        if in_fence:
            fence.append(line)
            continue
        m = _MD_HEADING_RE.match(line)
        if m:
            flush_para()
            level = len(m.group(1))
            out.append(f"<h{level}>{_md_inline(escape(m.group(2)))}</h{level}>")
        elif not line.strip():
            flush_para()
        else:
            para.append(line.strip())
    flush_para()
    if in_fence and fence:  # unterminated fence
        out.append(f"<pre><code>{escape(chr(10).join(fence))}</code></pre>")
    return "".join(out)


def _rst_inline(text: str) -> str:
    text = _RST_LITERAL_RE.sub(r"<code>\1</code>", text)
    return _RST_LINK_RE.sub(r'<a href="\2">\1</a>', text)


def render_rst(text: str) -> str:
    """Underline-style section titles; adornment char order of first
    appearance sets the level (docutils semantics), capped at h6."""
    lines = text.splitlines()
    out: list[str] = []
    para: list[str] = []
    level_of: dict[str, int] = {}

    def flush_para() -> None:
        if para:
            out.append(f"<p>{_rst_inline(escape(' '.join(para)))}</p>")
            para.clear()

    i = 0
    while i < len(lines):
        line = lines[i]
        nxt = lines[i + 1] if i + 1 < len(lines) else None
        img = _RST_IMAGE_RE.match(line.strip())
        if img:
            flush_para()
            out.append(f'<img src="{escape(img.group(1))}">')
            i += 1
            continue
        if (
            line.strip()
            and not _RST_ADORNMENT_RE.match(line)
            and nxt is not None
            and _RST_ADORNMENT_RE.match(nxt)
            and len(nxt.rstrip()) >= len(line.rstrip())
        ):
            flush_para()
            ch = nxt.strip()[0]
            if ch not in level_of:
                level_of[ch] = min(6, len(level_of) + 1)
            lvl = level_of[ch]
            out.append(f"<h{lvl}>{_rst_inline(escape(line.strip()))}</h{lvl}>")
            i += 2
            continue
        if not line.strip():
            flush_para()
        elif not _RST_ADORNMENT_RE.match(line):
            para.append(line.strip())
        i += 1
    flush_para()
    return "".join(out)


def render_txt(text: str) -> str:
    paras = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
    return "".join(f"<p>{escape(p)}</p>" for p in paras)


_RENDERERS = {
    None: render_rst,  # reference default for missing content type
    "": render_rst,
    "text/plain": render_txt,
    "text/x-rst": render_rst,
    "text/markdown": render_markdown,
}


def render_description(text: str | None, content_type: str | None) -> str:
    if not text:
        return ""
    renderer = _RENDERERS.get(content_type, render_rst)
    return renderer(text)


_HEADING_TAG_RE = re.compile(r"(</?h)([1-6])")


def shift_headings(html: str) -> str:
    """Shift every heading down one level, capped at h6 (reference
    ``normalize_headings``). Operates on rendered output only — literal
    text is already entity-escaped, so the regex can't match content."""
    if not html:
        return html
    return _HEADING_TAG_RE.sub(
        lambda m: m.group(1) + str(min(int(m.group(2)) + 1, 6)), html
    )


def unescape(text: str) -> str:
    return _html.unescape(text)
