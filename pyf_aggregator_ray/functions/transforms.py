"""Package-metadata transform family (reference plugin-chain semantics).

Reimplements, from behavior, the reference's per-document transforms over
markdown-ish package metadata:

* description splitting into weighted search fields title / first_chapter
  / main_content / changelog (``/root/reference/src/pyf/aggregator/
  plugins/description_splitter.py:129-291``; changelog-heading patterns
  :27-36; link/image stripping :103-126) — operating on markdown headings
  rather than rendered HTML (our corpus is text, the reference renders
  rst/md to HTML first, ``plugins/rst_to_html.py:10-85``)
* classifier extractors: framework_versions and python_versions
  (``plugins/framwork_versions.py:4-21``, ``plugins/python_versions.py``)
* repo-identifier extraction from the 5 URL shapes + reserved-owner
  blacklist (``enrichers/github.py:52-113``) and git-URL -> https
  normalization (``npm_fetcher.py:580-616``)
* ``clean_data`` null normalization: None list fields -> [], None
  timestamps -> 0, other None -> "", keyword string split on ``[,\\s]+``
  (``indexer.py:8-37``)
* a health score with fixed sub-score buckets in the reference's shape:
  recency + docs + metadata, capped at 100 (``plugins/health_score.py``,
  ``enrichers/health_calculator.py:104-223``) — thresholds here are OUR
  contract (golden-tested), not a numeric copy.

All are pure scalar/batch functions usable inside ``map_batches``.
"""

from __future__ import annotations

import re

CHANGELOG_HEADING_RE = re.compile(
    r"^(changelog|history|changes|release\s*notes|what'?s\s*new|versions?)$",
    re.IGNORECASE,
)

_MD_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_MD_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_MD_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")


def strip_links_and_images(text: str) -> str:
    """Remove markdown images entirely, keep link text (reference strips
    <a>/<img> from first_chapter)."""
    text = _MD_IMAGE_RE.sub("", text)
    return _MD_LINK_RE.sub(r"\1", text)


def split_description(markdown: str | None, summary: str = "") -> dict[str, str]:
    """Split a markdown document into the reference's weighted fields.

    title          = text of the first heading
    first_chapter  = summary + content up to the second heading
                     (links/images stripped); everything if no headings
    main_content   = from the second heading up to the changelog heading
    changelog      = from the first changelog-matching heading onward
    """
    out = {"title": "", "first_chapter": "", "main_content": "", "changelog": ""}
    if not markdown:
        out["first_chapter"] = strip_links_and_images(summary or "")
        return out
    lines = markdown.splitlines()
    headings: list[tuple[int, str]] = []  # (line_idx, heading_text)
    for i, line in enumerate(lines):
        m = _MD_HEADING_RE.match(line)
        if m:
            headings.append((i, m.group(2)))

    def block(a: int, b: int | None) -> str:
        return "\n".join(lines[a:b]).strip()

    if not headings:
        out["first_chapter"] = strip_links_and_images(
            (summary + "\n" if summary else "") + markdown
        ).strip()
        return out

    out["title"] = headings[0][1]
    changelog_pos = next(
        (i for i, (_, text) in enumerate(headings) if CHANGELOG_HEADING_RE.match(text)),
        None,
    )
    second = headings[1][0] if len(headings) > 1 else None
    first_chapter = block(0, second)
    out["first_chapter"] = strip_links_and_images(
        ((summary + "\n") if summary else "") + first_chapter
    ).strip()
    if changelog_pos is not None:
        cl_line = headings[changelog_pos][0]
        out["changelog"] = block(cl_line, None)
        if second is not None and second < cl_line:
            out["main_content"] = block(second, cl_line)
    elif second is not None:
        out["main_content"] = block(second, None)
    return out


# ---------------------------------------------------------------------------
# HTML-path splitter (reference render-then-split semantics)
# ---------------------------------------------------------------------------

_HTML_BLOCK_RE = re.compile(
    r"<(h[1-6]|p|pre|ul|ol|blockquote)(?:\s[^>]*)?>.*?</\1>|<img\b[^>]*/?>",
    re.S,
)
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_HTML_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_HTML_IMG_TAG_RE = re.compile(r"<img\b[^>]*/?>")


def _html_text(fragment: str) -> str:
    """Plain text of an HTML fragment (reference ``get_element_text``)."""
    import html as _h

    return _h.unescape(_HTML_TAG_RE.sub("", fragment)).strip()


def strip_html_links(s: str) -> str:
    return _HTML_A_RE.sub(r"\1", s)


def strip_html_images(s: str) -> str:
    return _HTML_IMG_TAG_RE.sub("", s)


def split_description_html(html_content: str | None) -> dict[str, str]:
    """Split rendered HTML into the reference's weighted fields — a
    behavioral mirror of ``plugins/description_splitter.py:129-253``
    over the block-level HTML our renderer emits:

    * title = plain text of the first heading (any level)
    * starts-with-heading: first_chapter = [0, 2nd heading)
    * starts-with-text:    first_chapter = [0, 1st heading) — the first
      heading is EXCLUDED and main_content starts at it
    * main_content runs to the changelog heading (or end)
    * changelog = from the first changelog-matching heading onward
    * links/images stripped from first_chapter
    """
    result = {"title": "", "first_chapter": "", "main_content": "", "changelog": ""}
    if not html_content or not html_content.strip():
        return result
    blocks = [
        (m.group(0), m.group(1) or "img")
        for m in _HTML_BLOCK_RE.finditer(html_content)
    ]
    if not blocks:
        result["first_chapter"] = html_content
        return result

    def serialize(a: int, b: int | None) -> str:
        end = len(blocks) if b is None else b
        if a >= len(blocks) or a >= end:
            return ""
        return "".join(h for h, _ in blocks[a:end])

    headings = [i for i, (_, tag) in enumerate(blocks) if tag.startswith("h")]
    if not headings:
        result["first_chapter"] = serialize(0, None)
    else:
        result["title"] = _html_text(blocks[headings[0]][0])
        changelog_idx = next(
            (
                i
                for i in headings
                if CHANGELOG_HEADING_RE.match(_html_text(blocks[i][0]))
            ),
            None,
        )
        starts_with_heading = headings[0] == 0
        if starts_with_heading:
            second = headings[1] if len(headings) > 1 else None
            result["first_chapter"] = serialize(0, second)
            if second is not None:
                result["main_content"] = serialize(second, changelog_idx)
        else:
            result["first_chapter"] = serialize(0, headings[0])
            result["main_content"] = serialize(headings[0], changelog_idx)
        if changelog_idx is not None:
            result["changelog"] = serialize(changelog_idx, None)
    result["first_chapter"] = strip_html_images(
        strip_html_links(result["first_chapter"])
    )
    return result


_FRAMEWORK_RE = re.compile(
    r"^Framework :: (?P<framework>\w+.*) :: (?P<version>\d+.*)$", re.IGNORECASE
)
_PYVER_RE = re.compile(
    r"^Programming Language :: Python :: (?P<version>\d+(\.\d+)*)$", re.IGNORECASE
)


def framework_versions(classifiers: list[str] | None) -> list[str]:
    out = []
    for cf in classifiers or []:
        m = _FRAMEWORK_RE.search(cf)
        if m:
            out.append(f"{m.group('framework')} {m.group('version')}")
    return out


def python_versions(classifiers: list[str] | None) -> list[str]:
    out = []
    for cf in classifiers or []:
        m = _PYVER_RE.search(cf)
        if m:
            out.append(m.group("version"))
    return out


def has_classifier_prefix(classifiers: list[str] | None, prefixes: list[str]) -> bool:
    """Keep a doc iff ANY classifier starts with ANY filter prefix
    (reference ``fetcher.py:582-602``)."""
    for cf in classifiers or []:
        for p in prefixes:
            if cf.startswith(p):
                return True
    return False


def restructure_pypi_json(package_json: dict | None) -> dict | None:
    """S2 restructure (reference ``fetcher.py:565-580``): flatten the
    registry JSON's ``info`` section into the document, attach the
    root-level ``urls`` list, drop the deprecated ``downloads`` counters
    (info-level and per-url) and per-url ``md5_digest``, and seed
    ``name_sortable`` from the name. Returns None when there is no
    ``info`` section (the reference skips such packages)."""
    if not package_json:
        return None
    data = package_json.get("info")
    if not data:
        return None
    data = dict(data)
    data["urls"] = [dict(u) for u in package_json.get("urls", [])]
    data.pop("downloads", None)
    for url in data["urls"]:
        url.pop("downloads", None)
        url.pop("md5_digest", None)
    data["name_sortable"] = data.get("name")
    return data


# ---------------------------------------------------------------------------
# repo URL extraction / normalization
# ---------------------------------------------------------------------------

_GH_HTTP = re.compile(r"^(?:http[s]?://|www\.)github\.com/(.+?/.+)", re.IGNORECASE)
_GH_GIT = re.compile(r"^git://github\.com/([^/]+/[^/]+?)(?:\.git)?$")
_GH_GIT_HTTPS = re.compile(r"^git\+https://github\.com/([^/]+/[^/]+?)(?:\.git)?$")
_GH_GIT_SSH = re.compile(r"^git\+ssh://git@github\.com[:/]([^/]+/[^/]+?)(?:\.git)?$")
_GH_SSH = re.compile(r"^git@github\.com[:/]([^/]+/[^/]+?)(?:\.git)?$")

RESERVED_OWNERS = frozenset(
    {"about", "apps", "collections", "marketplace", "orgs", "settings",
     "sponsors", "topics"}
)


_REPO_NAME_PART_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def extract_repo_identifier(url: str | None) -> str | None:
    """URL -> 'owner/repo' or None; handles the 5 URL shapes and strips
    query/fragment/.git.

    The reference extracts in two steps (``enrichers/github.py:
    457-498`` then ``:101-113``): the HTTPS/www shape captures the whole
    path and TRUNCATES to the first two segments (so
    ``github.com/o/r/tree/main/docs`` -> ``o/r``), while the git:// /
    git+https / git+ssh / ssh shapes match exactly ``owner/repo(.git)``
    and deeper git paths fail the regex entirely; the identifier is then
    cleaned of #fragment/?query and validated (two non-empty
    ``[A-Za-z0-9._-]+`` segments, owner not reserved). This function
    folds extract+clean+validate into one call with those exact
    per-shape rules."""
    if not url:
        return None
    url = url.strip()
    path = None
    truncate = False
    for rx in (_GH_GIT_HTTPS, _GH_GIT_SSH, _GH_GIT, _GH_SSH):
        m = rx.match(url)
        if m:
            path = m.group(1)
            break
    if path is None:
        m = _GH_HTTP.match(url)
        if m:
            path = m.group(1)
            truncate = True
    if path is None:
        return None
    parts = [p for p in path.split("/") if p]
    if truncate and len(parts) > 2:
        parts = parts[:2]
    cleaned = "/".join(parts).split("#", 1)[0].split("?", 1)[0]
    parts = [p for p in cleaned.split("/") if p]
    if len(parts) != 2:
        return None
    owner, repo = parts
    if repo.endswith(".git"):
        repo = repo[: -len(".git")]
    if owner.lower() in RESERVED_OWNERS or not owner or not repo:
        return None
    if not (_REPO_NAME_PART_RE.match(owner) and _REPO_NAME_PART_RE.match(repo)):
        return None
    return f"{owner}/{repo}"


def url_matches_github(url: str | None) -> bool:
    """True when the URL matches ANY of the five GitHub shapes — i.e. the
    reference's extraction regexes would fire on it, regardless of
    whether the captured identifier later validates."""
    if not url:
        return False
    u = url.strip()
    return any(
        rx.match(u) for rx in (_GH_GIT_HTTPS, _GH_GIT_SSH, _GH_GIT, _GH_SSH, _GH_HTTP)
    )


def resolve_repo_identifier(doc: dict) -> str | None:
    """Doc-level repo-id resolution with the reference's URL priority
    (``enrichers/github.py:457-498``): home_page, project_url, url,
    repository_url, then every project_urls value, in order. The FIRST
    URL matching a GitHub shape decides the outcome — the reference
    returns its extraction immediately (a malformed capture surfaces as
    a problem downstream, it does NOT fall through to later URLs)."""
    urls = [
        doc.get("home_page"),
        doc.get("project_url"),
        doc.get("url"),
        doc.get("repository_url"),
    ] + list((doc.get("project_urls") or {}).values())
    for url in urls:
        if not url:
            continue
        if url_matches_github(url):
            return extract_repo_identifier(url)
    return None


def normalize_git_url(url: str | None) -> str | None:
    """git+/git:///ssh git URL -> canonical https URL, '.git' stripped
    (reference ``npm_fetcher.py:580-616``)."""
    if not url:
        return None
    url = url.strip()
    for prefix in ("git+https://", "git+http://"):
        if url.startswith(prefix):
            url = "https://" + url[len(prefix):]
            break
    if url.startswith("git://"):
        url = "https://" + url[len("git://"):]
    m = re.match(r"^(?:ssh://)?git@([^:/]+)[:/](.+)$", url)
    if m:
        url = f"https://{m.group(1)}/{m.group(2)}"
    if url.endswith(".git"):
        url = url[: -len(".git")]
    return url


# ---------------------------------------------------------------------------
# screenshot detection (reference plugins/screenshot_detector.py:18-216)
# ---------------------------------------------------------------------------

# The reference's badge-service patterns, verbatim
# (plugins/screenshot_detector.py:18-39) — including the generic
# "badge" fallback that subsumes badge.fury/badgen/readthedocs-badge.
BADGE_PATTERNS = [
    r"shields\.io",
    r"img\.shields\.io",
    r"badge\.fury\.io",
    r"travis-ci\.(org|com)",
    r"codecov\.io",
    r"coveralls\.io",
    r"circleci\.com",
    r"github\.com/[^/]+/[^/]+/workflows/[^/]+\.svg",
    r"github\.com/[^/]+/[^/]+/actions/workflows/[^/]+/badge",
    r"readthedocs\.org/[^/]+/badge",
    r"pypi\.org/badges",
    r"pypi\.python\.org/[^/]*badge",
    r"ci\.appveyor\.com",
    r"snyk\.io",
    r"codacy\.com",
    r"sonarcloud\.io",
    r"badge",
]
_BADGE_URL_RE = re.compile("|".join(BADGE_PATTERNS), re.IGNORECASE)
_MD_IMG_URL_RE = re.compile(r"!\[[^\]]*\]\(([^)\s]+)[^)]*\)")
_HTML_IMG_RE = re.compile(r"<img\b[^>]*>", re.IGNORECASE)
_ATTR_WIDTH_RE = re.compile(
    r"""\bwidth\s*=\s*(?:["']([^"']*)["']|([^\s>"']+))""", re.IGNORECASE
)
_STYLE_RE = re.compile(
    r"""\bstyle\s*=\s*["']([^"']*)["']""", re.IGNORECASE
)
_STYLE_WIDTH_RE = re.compile(r"width\s*:\s*(\d+)(?:px)?", re.IGNORECASE)
_SRC_RE = re.compile(r"""\bsrc\s*=\s*["']([^"']+)["']""", re.IGNORECASE)

MIN_SCREENSHOT_WIDTH = 200


def is_badge_url(url) -> bool:
    """Reference ``screenshot_detector.py:45-56``."""
    if not url:
        return False
    return bool(_BADGE_URL_RE.search(url))


def parse_width_from_style(style) -> int | None:
    """Reference ``screenshot_detector.py:59-76``: first ``width: N`` in
    the CSS string, px suffix optional."""
    if not style:
        return None
    m = _STYLE_WIDTH_RE.search(style)
    return int(m.group(1)) if m else None


def parse_width_from_attribute(width_attr) -> int | None:
    """Reference ``screenshot_detector.py:79-96``: strip a px suffix and
    whitespace, None on anything non-numeric."""
    if not width_attr:
        return None
    width_str = str(width_attr).rstrip("px").strip()
    try:
        return int(width_str)
    except ValueError:
        return None


def _html_img_width(tag: str) -> int | None:
    """Reference priority (``screenshot_detector.py:126-159``): the HTML
    width attribute wins, then the inline-style width; the reference's
    third step (fetch the image header over the network) is out of scope
    in this engine — an ABSOLUTE http(s) URL with no declared width is
    treated as unknown-size-keep, a relative one as undeterminable."""
    am = _ATTR_WIDTH_RE.search(tag)
    if am:
        w = parse_width_from_attribute(am.group(1) or am.group(2))
        if w is not None:
            return w
    sm = _STYLE_RE.search(tag)
    if sm:
        w = parse_width_from_style(sm.group(1))
        if w is not None:
            return w
    return None


def find_screenshots(markdown: str | None) -> list[str]:
    """Meaningful screenshot URLs in a document: markdown/HTML images,
    excluding badge URLs (reference pattern list), and excluding HTML
    images whose width is determinable and below 200 px. Markdown images
    carry no size info and are kept unless badge-like. HTML images with
    no declared width follow the reference's fetch-fallback shape minus
    the network: absolute http(s) URLs are kept (unknown size), relative
    URLs are dropped (the reference only fetches absolute URLs —
    ``screenshot_detector.py:155-158`` — so a relative no-width image is
    never counted there either)."""
    if not markdown:
        return []
    out: list[str] = []
    for url in _MD_IMG_URL_RE.findall(markdown):
        if not is_badge_url(url):
            out.append(url)
    for tag in _HTML_IMG_RE.findall(markdown):
        m = _SRC_RE.search(tag)
        if not m:
            continue
        url = m.group(1)
        if is_badge_url(url):
            continue
        width = _html_img_width(tag)
        if width is not None:
            if width >= MIN_SCREENSHOT_WIDTH:
                out.append(url)
        elif url.startswith(("http://", "https://")):
            out.append(url)
    return out


def detect_screenshots(html_content) -> dict:
    """The reference plugin's result shape
    (``screenshot_detector.py:162-216``)."""
    shots = find_screenshots(html_content)
    return {
        "has_screenshots": bool(shots),
        "screenshot_count": len(shots),
        "screenshots": shots,
    }


# ---------------------------------------------------------------------------
# clean_data normalization
# ---------------------------------------------------------------------------

LIST_FIELDS = ("classifiers", "keywords", "requires_dist", "framework_versions",
               "python_versions")
TIMESTAMP_FIELDS = ("upload_timestamp",)
_KEYWORD_SPLIT_RE = re.compile(r"[,\s]+")


def clean_data(doc: dict) -> dict:
    """Null normalization with the reference's rules (``indexer.py:8-37``
    plus the npm indexer's additions, ``npm_indexer.py:17-60``):
    None list fields -> [], keyword STRING -> list split on [,\\s]+,
    keyword LIST entries stripped with empties dropped, None/empty-string
    timestamps -> 0 (sorts to the bottom descending), ``npm_*_score``
    floats None -> 0.0, other None -> '', default registry 'pypi'."""
    out = dict(doc)
    for k in LIST_FIELDS:
        if k in out and out[k] is None:
            out[k] = []
    kw = out.get("keywords")
    if isinstance(kw, str):
        out["keywords"] = [w for w in _KEYWORD_SPLIT_RE.split(kw) if w]
    elif isinstance(kw, list):
        out["keywords"] = [k.strip() for k in kw if k and str(k).strip()]
    for k in TIMESTAMP_FIELDS:
        if k in out and (out[k] is None or out[k] == ""):
            out[k] = 0
    for k, v in out.items():
        if v is None:
            if k.startswith("npm_") and k.endswith("_score"):
                out[k] = 0.0
            else:
                out[k] = ""
    out.setdefault("registry", "pypi")
    return out


# ---------------------------------------------------------------------------
# health score — NUMERIC PARITY with the reference
# (plugins/health_score.py:78-311 + enrichers/health_calculator.py:104-323)
# ---------------------------------------------------------------------------

SECONDS_PER_DAY = 86_400

_DOCS_URL_REPO_ROOT_RE = re.compile(
    r"^https?://(www\.)?(github|gitlab)\.(com|io)/[^/]+/[^/]+(/?|#.*)$"
)
_DOC_URL_KEYWORDS = ("documentation", "docs", "homepage", "home")


def is_meaningful_docs_url(url) -> bool:
    """Reference ``health_score.py:147-177``: reject empty, PyPI detail
    pages, and bare GitHub/GitLab repo roots (those aren't docs)."""
    if not url or not isinstance(url, str):
        return False
    u = url.lower()
    if "pypi.org/project/" in u:
        return False
    if _DOCS_URL_REPO_ROOT_RE.match(u):
        return False
    return True


def count_words(text) -> int:
    """Whitespace word count (reference ``health_score.py:8-12``)."""
    if not text:
        return 0
    return len(str(text).split())


def _recency_with_problems(upload_timestamp, now_ts: int) -> tuple[int, list]:
    """Reference buckets + problem strings (``health_score.py:78-134``):
    <180d=40, <365d=30, <730d=20, <1095d=10, <1825d=5, else 0.

    Timestamp handling replicates the reference exactly, quirks
    included: int = unix seconds (0/falsy = missing), str = ISO-8601
    with the ``Z`` suffix normalized (a NAIVE iso string raises on the
    aware subtraction and therefore reports "no release timestamp" —
    the reference's try wraps the whole computation), any other type
    (floats included) is rejected, out-of-range ints surface as OSError
    -> missing. ``now_ts`` is injected — no wall clock."""
    from datetime import datetime, timezone

    problems: list = []
    if not upload_timestamp:
        problems.append("no release timestamp")
        return 0, problems
    try:
        if isinstance(upload_timestamp, int):
            upload_dt = datetime.fromtimestamp(upload_timestamp, tz=timezone.utc)
        elif isinstance(upload_timestamp, str):
            upload_dt = datetime.fromisoformat(
                upload_timestamp.replace("Z", "+00:00")
            )
        else:
            problems.append("no release timestamp")
            return 0, problems
        now = datetime.fromtimestamp(now_ts, tz=timezone.utc)
        age_days = (now - upload_dt).days
        if age_days < 180:
            return 40, problems
        if age_days < 365:
            problems.append("last release over 6 months ago")
            return 30, problems
        if age_days < 730:
            problems.append("last release over 1 year ago")
            return 20, problems
        if age_days < 1095:
            problems.append("last release over 2 years ago")
            return 10, problems
        if age_days < 1825:
            problems.append("last release over 3 years ago")
            return 5, problems
        problems.append("last release over 5 years ago")
        return 0, problems
    except (ValueError, TypeError, AttributeError, OSError, OverflowError):
        problems.append("no release timestamp")
        return 0, problems


def _recency_score(upload_timestamp, now_ts: int) -> int:
    return _recency_with_problems(upload_timestamp, now_ts)[0]


def _docs_with_problems(doc: dict) -> tuple[int, list, list]:
    """Reference ``health_score.py:180-252``: description >150 chars = 18
    base; bonuses: meaningful docs_url +4, documentation project URL +3,
    meaningful screenshots +5; plus the 500-word README rule (words in
    first_chapter + main_content, changelog excluded — under 500 with no
    external docs link reports "not enough documentation"). Problem and
    bonus strings are reference-verbatim, in reference order. The
    reference scores the RENDERED html (rst_to_html replaces
    ``description``); the rendered path here keeps it in
    ``description_html``."""
    score = 0
    problems: list = []
    bonuses: list = []
    has_docs_url = is_meaningful_docs_url(doc.get("docs_url"))
    if has_docs_url:
        score += 4
        bonuses.append({"reason": "has dedicated docs URL", "points": 4})
    # score the RENDERED html when the renderer has produced it; fall back
    # to the raw description so a doc scored outside the full chain (no
    # renderer pass) keeps its docs points; non-string values degrade to
    # missing (totality on messy rows)
    desc = doc.get("description_html") or doc.get("description") or ""
    if not isinstance(desc, str):
        desc = ""
    if desc and len(desc) > 150:
        score += 18
    else:
        problems.append("description too short (<150 chars)")
    has_doc_project_url = False
    project_urls = doc.get("project_urls") or {}
    if isinstance(project_urls, dict):
        for key, url in project_urls.items():
            if any(kw in str(key).lower() for kw in _DOC_URL_KEYWORDS):
                if is_meaningful_docs_url(url):
                    has_doc_project_url = True
                    score += 3
                    bonuses.append(
                        {"reason": "has documentation project URL", "points": 3}
                    )
                    break
    readme_words = count_words(doc.get("first_chapter", "")) + count_words(
        doc.get("main_content", "")
    )
    if readme_words < 500 and not has_docs_url and not has_doc_project_url:
        problems.append(
            "not enough documentation (extend README to 500+ words"
            " or add documentation link)"
        )
    if desc and find_screenshots(desc):
        score += 5
        bonuses.append({"reason": "has meaningful screenshots", "points": 5})
    return score, problems, bonuses


def _docs_score(doc: dict) -> int:
    return _docs_with_problems(doc)[0]


def _metadata_with_problems(doc: dict) -> tuple[int, list, list]:
    """Reference ``health_score.py:265-311``: maintainer-or-author 10
    (both missing reports BOTH problems), license 10, >=3 classifiers
    (pypi) / keywords (npm) 10."""
    score = 0
    problems: list = []
    if doc.get("maintainer") or doc.get("author"):
        score += 10
    else:
        problems.append("no maintainer info")
        problems.append("no author info")
    if doc.get("license"):
        score += 10
    else:
        problems.append("no license")
    def _count(value) -> int:
        # reference-exact len() semantics (health_score.py:265-311 calls
        # bare len(), so a pre-clean comma STRING counts its characters);
        # only len-less scalars (ints, None) degrade to 0 instead of
        # crashing — totality on messy rows
        try:
            return len(value)
        except TypeError:
            return 0

    if (doc.get("registry") or "pypi") == "npm":
        if _count(doc.get("keywords")) >= 3:
            score += 10
        else:
            problems.append("fewer than 3 keywords")
    elif _count(doc.get("classifiers")) >= 3:
        score += 10
    else:
        problems.append("fewer than 3 classifiers")
    return score, problems, []


def _metadata_score(doc: dict) -> int:
    return _metadata_with_problems(doc)[0]


MAX_RECENCY_POINTS = 40
MAX_DOCS_POINTS = 18  # base points only; bonuses are extra credit
MAX_METADATA_POINTS = 30


def health_report(doc: dict, now_ts: int) -> dict:
    """The reference plugin's FULL output shape (``health_score.py:
    15-75``): total score plus a per-factor breakdown with points,
    max_points, problems and bonuses (reference-verbatim strings).
    ``health_score()`` remains the numeric-only fast path used by the
    batch pipeline; this report form backs user-facing diagnostics."""
    recency, r_problems = _recency_with_problems(
        doc.get("upload_timestamp"), now_ts
    )
    docs_score, d_problems, d_bonuses = _docs_with_problems(doc)
    meta, m_problems, m_bonuses = _metadata_with_problems(doc)
    return {
        "health_score": int(recency + docs_score + meta),
        "health_score_breakdown": {
            "recency": {
                "points": recency,
                "max_points": MAX_RECENCY_POINTS,
                "problems": r_problems,
                "bonuses": [],
            },
            "documentation": {
                "points": docs_score,
                "max_points": MAX_DOCS_POINTS,
                "problems": d_problems,
                "bonuses": d_bonuses,
            },
            "metadata": {
                "points": meta,
                "max_points": MAX_METADATA_POINTS,
                "problems": m_problems,
                "bonuses": m_bonuses,
            },
        },
    }


def _stars_bonus(stars: int) -> int:
    """Reference ``health_calculator.py:225-248``. The reference only
    ever feeds this GitHub API ints; this engine scores arbitrary table
    rows, so non-numeric values degrade to 0 (the same catch-style the
    reference uses in its activity/issue helpers)."""
    try:
        if stars >= 1000:
            return 10
        if stars >= 500:
            return 7
        if stars >= 100:
            return 5
        if stars >= 50:
            return 3
        if stars >= 10:
            return 1
        return 0
    except TypeError:
        return 0


def _activity_bonus(github_updated, now_ts: int) -> int:
    """Reference ``health_calculator.py:250-284`` (invalid timestamp
    types return 0, like the reference's try/except)."""
    if not github_updated:
        return 0
    try:
        age_days = (now_ts - github_updated) / SECONDS_PER_DAY
    except (ValueError, TypeError):
        return 0
    if age_days < 30:
        return 10
    if age_days < 90:
        return 7
    if age_days < 180:
        return 5
    if age_days < 365:
        return 3
    return 0


def _issue_bonus(open_issues, stars) -> int:
    """Reference ``health_calculator.py:286-321`` (invalid operand
    types return 0, like the reference's try/except)."""
    if stars == 0:
        return 0
    try:
        ratio = open_issues / stars
    except (ValueError, TypeError, ZeroDivisionError):
        return 0
    if ratio < 0.1:
        return 10
    if ratio < 0.3:
        return 7
    if ratio < 0.5:
        return 5
    if ratio < 1.0:
        return 3
    return 0


def enhanced_health_report(doc: dict, now_ts: int) -> dict:
    """The reference enricher's FULL enhanced report
    (``enrichers/health_calculator.py:104-223``): the base three-factor
    breakdown plus GitHub bonuses, with the reference's exact
    conditional shape —

    - ``github_stars_bonus`` / ``github_activity_bonus`` /
      ``github_issue_bonus`` / ``github_bonus_total`` appear in the
      breakdown ONLY when that bonus is > 0;
    - stale GitHub activity appends to the RECENCY problems
      ("no GitHub activity in 1+ year" when the activity bonus is 0,
      "limited GitHub activity (6+ months)" when it is <= 3), each at
      most once;
    - an issue bonus >= 5 appends the plain string
      "good issue management" to the METADATA bonuses (the reference
      mixes this string into the dict-shaped bonus list);
    - the issue bonus is computed only when BOTH ``github_open_issues``
      and ``github_stars`` keys are present and stars > 0;
    - the final score is ``min(100, base + github_bonus)``;
    - ``health_score_last_calculated`` is stamped from the injected
      ``now_ts`` (the reference uses the wall clock; determinism
      requirement here).
    """
    recency, r_problems = _recency_with_problems(
        doc.get("upload_timestamp"), now_ts
    )
    docs_score, d_problems, d_bonuses = _docs_with_problems(doc)
    meta, m_problems, m_bonuses = _metadata_with_problems(doc)
    base_score = recency + docs_score + meta

    github_bonus = 0
    stars = doc.get("github_stars", 0)
    stars_bonus = 0
    if stars:
        stars_bonus = _stars_bonus(stars)
        github_bonus += stars_bonus

    github_updated = doc.get("github_updated")
    activity_bonus = 0
    if github_updated:
        activity_bonus = _activity_bonus(github_updated, now_ts)
        github_bonus += activity_bonus
        if activity_bonus == 0:
            if "no GitHub activity in 1+ year" not in r_problems:
                r_problems.append("no GitHub activity in 1+ year")
        elif activity_bonus <= 3:
            if "limited GitHub activity (6+ months)" not in r_problems:
                r_problems.append("limited GitHub activity (6+ months)")

    issue_bonus = 0
    if "github_open_issues" in doc and "github_stars" in doc:
        stars_for_ratio = doc.get("github_stars", 0)
        if isinstance(stars_for_ratio, (int, float)) and stars_for_ratio > 0:
            issue_bonus = _issue_bonus(
                doc.get("github_open_issues", 0), stars_for_ratio
            )
            github_bonus += issue_bonus
            if issue_bonus >= 5 and "good issue management" not in m_bonuses:
                m_bonuses.append("good issue management")

    breakdown: dict = {
        "recency": {
            "points": recency,
            "max_points": MAX_RECENCY_POINTS,
            "problems": r_problems,
            "bonuses": [],
        },
        "documentation": {
            "points": docs_score,
            "max_points": MAX_DOCS_POINTS,
            "problems": d_problems,
            "bonuses": d_bonuses,
        },
        "metadata": {
            "points": meta,
            "max_points": MAX_METADATA_POINTS,
            "problems": m_problems,
            "bonuses": m_bonuses,
        },
    }
    if stars_bonus > 0:
        breakdown["github_stars_bonus"] = stars_bonus
    if activity_bonus > 0:
        breakdown["github_activity_bonus"] = activity_bonus
    if issue_bonus > 0:
        breakdown["github_issue_bonus"] = issue_bonus
    if github_bonus > 0:
        breakdown["github_bonus_total"] = github_bonus

    return {
        "health_score": int(min(100, base_score + github_bonus)),
        "health_score_breakdown": breakdown,
        "health_score_last_calculated": int(now_ts),
    }


def health_score(doc: dict, now_ts: int) -> dict:
    """Reference-exact composite health score: recency 0-40 + docs base
    18 (+bonuses 4/3/5) + metadata 0-30 + GitHub bonuses <=30, capped at
    100 (``health_calculator.py:104-223``). ``now_ts`` must be passed in
    (no wall clock: determinism requirement)."""
    recency = _recency_score(doc.get("upload_timestamp"), now_ts)
    docs_score = _docs_score(doc)
    meta = _metadata_score(doc)

    github_bonus = 0
    stars = doc.get("github_stars", 0) or 0
    if stars:
        github_bonus += _stars_bonus(stars)
    if doc.get("github_updated"):
        github_bonus += _activity_bonus(doc["github_updated"], now_ts)
    # same issue-bonus gate and None handling as enhanced_health_report
    # and the reference (health_calculator.py:168-180: a present-but-None
    # open_issues hits the try/except -> 0, it is NOT coerced to 0/ratio)
    if (
        "github_open_issues" in doc
        and "github_stars" in doc
        and isinstance(stars, (int, float))
        and stars > 0
    ):
        github_bonus += _issue_bonus(doc.get("github_open_issues", 0), stars)

    total = min(100, recency + docs_score + meta + github_bonus)
    return {
        "health_score": int(total),
        "health_recency": recency,
        "health_docs": docs_score,
        "health_metadata": meta,
        "health_github_bonus": github_bonus,
    }
