"""Plugin-chain stage: the reference's user-extension surface (§2.11).

The reference composes per-document transforms as an ordered module-level
list, idempotently slice-assigned so long-lived workers don't stack it
(``/root/reference/src/pyf/aggregator/plugins/__init__.py:12-27``), and
every write path must run the chain or the sink rejects documents
(``queue.py:104-117``). Here:

* a *plugin* is ``name -> callable(doc_dict) -> None|dict`` (mutating or
  returning the doc)
* ``PackageChain`` composes the ordered list ONCE per actor and applies
  it per batch inside ``map_batches`` (rows through the chain as dicts —
  package metadata is the small side of the system; the code corpus
  never takes this path)
* ``validate_required`` enforces the sink contract before indexing
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from ..functions import transforms as tf
from ..functions.versions import version_parts, version_sortable

Plugin = Callable[[dict], dict | None]

REQUIRED_COLUMNS = ("name", "version", "registry", "version_sortable")

NOW_TS = 1_700_000_000  # fixed evaluation timestamp (determinism: no wall clock)


def plugin_clean(doc: dict) -> dict:
    return tf.clean_data(doc)


def plugin_version_slicer(doc: dict) -> None:
    major, minor, bugfix, postfix = version_parts(doc.get("version"))
    doc["version_major"] = major
    doc["version_minor"] = minor
    doc["version_bugfix"] = bugfix
    doc["version_postfix"] = postfix
    doc["version_sortable"] = version_sortable(doc.get("version"))


def plugin_classifier_extracts(doc: dict) -> None:
    doc["framework_versions"] = tf.framework_versions(doc.get("classifiers"))
    doc["python_versions"] = tf.python_versions(doc.get("classifiers"))


def plugin_renderer(doc: dict) -> None:
    """M9: render the description to HTML by description_content_type and
    shift headings down one level (reference ``plugins/rst_to_html.py:
    10-85``). Only runs for documents that CARRY a content-type key (the
    registry-metadata path); the code-corpus path has no content type and
    keeps markdown-native splitting. The rendered HTML goes to
    ``description_html`` (the original description is preserved)."""
    if "description_content_type" not in doc:
        return
    from ..functions import rendering

    html = rendering.render_description(
        doc.get("description"), doc.get("description_content_type") or None
    )
    doc["description_html"] = rendering.shift_headings(html)


def plugin_description_splitter(doc: dict) -> None:
    if "description_content_type" in doc:
        # reference path: split the RENDERED html, then prepend summary
        # (plugins/description_splitter.py:256-283 order)
        fields = tf.split_description_html(doc.get("description_html") or "")
        summary = doc.get("summary") or ""
        if summary:
            fields["first_chapter"] = (
                f"{summary}\n\n{fields['first_chapter']}"
                if fields["first_chapter"]
                else summary
            )
        doc.update(fields)
    else:
        fields = tf.split_description(doc.get("description"), doc.get("summary") or "")
        doc.update(fields)


def plugin_repo_identifier(doc: dict) -> None:
    url = tf.normalize_git_url(doc.get("home_page"))
    doc["repo_url"] = url or ""
    # full reference URL priority: home_page, project_url, url,
    # repository_url, project_urls values (github.py:457-498)
    doc["repo_identifier"] = tf.resolve_repo_identifier(doc) or ""


def plugin_health_score(doc: dict) -> None:
    doc.update(tf.health_score(doc, NOW_TS))


def _load_curated() -> dict:
    import os

    import yaml

    path = os.path.join(os.path.dirname(__file__), "..", "state", "curated.yaml")
    with open(path) as f:
        return yaml.safe_load(f) or {}


_CURATED: dict | None = None


def plugin_curated(doc: dict) -> None:
    """M12: attach the hand-curated annotation for the package
    (reference ``plugins/curated.py:13-17``: a name-keyed YAML map;
    absent names are uncurated). The map loads once per worker process —
    the broadcast-small-side shape. The reference leaves the field
    absent on uncurated docs; rows here flow back into Arrow, so the
    annotation flattens to schema-stable columns with 0/"" as the
    uncurated values (a curated score is always >= 1)."""
    global _CURATED
    if _CURATED is None:
        _CURATED = _load_curated()
    curated = _CURATED.get(doc.get("name")) or {}
    doc["curated_score"] = int(curated.get("score") or 0)
    doc["curated_domain"] = str(curated.get("domain") or "")


DEFAULT_CHAIN: list[tuple[str, Plugin]] = [
    ("clean", plugin_clean),
    ("version_slicer", plugin_version_slicer),
    ("classifier_extracts", plugin_classifier_extracts),
    ("renderer", plugin_renderer),
    ("description_splitter", plugin_description_splitter),
    ("repo_identifier", plugin_repo_identifier),
    ("curated", plugin_curated),
    ("health_score", plugin_health_score),
]


class PackageChain:
    """Actor-pool stage applying the ordered plugin chain per batch."""

    def __init__(self, chain: list[tuple[str, Plugin]] | None = None):
        # composed once per actor — the reference's idempotent
        # registration pattern (slice assignment, plugins/__init__.py:21)
        self.chain = list(chain) if chain is not None else list(DEFAULT_CHAIN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.to_pylist()
        out = []
        for doc in docs:
            for _, plugin in self.chain:
                res = plugin(doc)
                if res is not None:
                    doc = res
            out.append(doc)
        return pa.Table.from_pylist(out)


def validate_required(batch: pa.Table) -> pa.Table:
    """Sink contract: reject batches missing chain-produced columns
    (reference: un-chained documents are rejected by the schema)."""
    missing = [c for c in REQUIRED_COLUMNS if c not in batch.column_names]
    if missing:
        raise ValueError(f"documents missing required columns {missing}; "
                         "was the plugin chain applied?")
    return batch
