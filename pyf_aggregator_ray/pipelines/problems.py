"""Per-run enrichment problem report (JSON + Markdown side artifact).

The reference's GitHub enricher collects every package whose repository
could not be enriched and flushes an incremental report — JSON
(``{"count": N, "problems": [...]}``, indent=2, sorted keys) plus a
Markdown table grouped by reason — after EVERY recorded problem and
again in ``finally``, so the report survives a hard kill mid-run
(``/root/reference/src/pyf/aggregator/enrichers/github.py:284-296,
312-376``). This module reproduces that artifact from the Ray enrich
pipelines:

* detection is vectorized per batch (``problems_batch``) with the same
  three reasons and the same candidate-URL collection
  (``github.py:300-310``);
* each map_batches task appends its problems to a uniquely-named JSONL
  part file AND re-renders the aggregate report immediately — the
  distributed analog of flush-per-problem (a killed run leaves a valid
  report covering every finished partition);
* ``finalize_problem_report`` re-renders from all parts (the caller's
  ``finally``).

``not_found`` (an HTTP 404 on the live GitHub API, ``github.py:255``)
cannot occur in this sandboxed engine — the reason stays in the label
table so the Markdown section ordering matches the reference, and the
writer handles it when a future live enricher records it.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pyarrow as pa

from ..functions import transforms as tf

# reference github.py:84-88, verbatim labels
PROBLEM_REASON_LABELS = {
    "no_repo_url": "No GitHub URL in package metadata",
    "malformed_identifier": "Malformed repository identifier",
    "not_found": "Repository not found (404)",
}

_URL_FIELDS = ("home_page", "project_url", "url", "repository_url")


def candidate_urls(doc: dict) -> dict[str, str]:
    """The non-empty URLs considered when looking for a GitHub repo —
    reference ``github.py:300-310`` (project_urls entries keyed as
    ``project_urls.<key>``)."""
    urls = {k: doc.get(k) for k in _URL_FIELDS}
    for key, value in (doc.get("project_urls") or {}).items():
        urls[f"project_urls.{key}"] = value
    return {k: v for k, v in urls.items() if v}


def raw_repo_identifier(url: str) -> str | None:
    """The reference's TWO-STEP extraction, step one only: capture the
    path for whichever GitHub URL shape matches (HTTPS/www truncating to
    the first two segments), strip #fragment/?query/.git — but do NOT
    validate (``github.py:457-498`` + ``:101-113``). A capture that then
    fails validation is exactly the 'malformed_identifier' problem."""
    url = url.strip()
    path = None
    truncate = False
    for rx in (tf._GH_GIT_HTTPS, tf._GH_GIT_SSH, tf._GH_GIT, tf._GH_SSH):
        m = rx.match(url)
        if m:
            path = m.group(1)
            break
    if path is None:
        m = tf._GH_HTTP.match(url)
        if m:
            path = m.group(1)
            truncate = True
    if path is None:
        return None
    parts = [p for p in path.split("/") if p]
    if truncate and len(parts) > 2:
        parts = parts[:2]
    cleaned = "/".join(parts).split("#", 1)[0].split("?", 1)[0]
    if cleaned.endswith(".git"):
        cleaned = cleaned[: -len(".git")]
    return cleaned


def classify_repo_problem(doc: dict) -> tuple[str | None, str | None]:
    """-> (repo_identifier, reason|None). Mirrors the reference's flow
    (``github.py:201-215``): the FIRST URL matching a GitHub shape
    decides; a valid capture enriches (reason None), an invalid one is
    'malformed_identifier' (raw capture reported), and no GitHub-shaped
    URL anywhere is 'no_repo_url'."""
    urls = [doc.get(k) for k in _URL_FIELDS] + list(
        (doc.get("project_urls") or {}).values()
    )
    for url in urls:
        if not url:
            continue
        if tf.url_matches_github(url):
            valid = tf.extract_repo_identifier(url)
            if valid is not None:
                return valid, None
            return raw_repo_identifier(url), "malformed_identifier"
    return None, "no_repo_url"


PROBLEM_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("repo_identifier", pa.string()),
        ("reason", pa.string()),
        ("urls_json", pa.string()),
    ]
)


def problems_batch(batch: pa.Table) -> pa.Table:
    """Package batch -> problem rows (possibly empty). One row per
    package whose repo cannot be enriched."""
    if batch.num_rows == 0:
        return PROBLEM_SCHEMA.empty_table()
    names, idents, reasons, urls_js = [], [], [], []
    for doc in batch.to_pylist():
        ident, reason = classify_repo_problem(doc)
        if reason is None:
            continue
        names.append(doc.get("name"))
        idents.append(ident)
        reasons.append(reason)
        urls_js.append(json.dumps(candidate_urls(doc), sort_keys=True))
    return pa.table(
        {
            "name": pa.array(names, pa.string()),
            "repo_identifier": pa.array(idents, pa.string()),
            "reason": pa.array(reasons, pa.string()),
            "urls_json": pa.array(urls_js, pa.string()),
        },
        schema=PROBLEM_SCHEMA,
    )


def render_problem_markdown(problems: list[dict]) -> str:
    """Markdown report grouped by reason — shape-identical to the
    reference renderer (``github.py:349-376``): sections in
    PROBLEM_REASON_LABELS order, entries sorted by name, three-column
    table with <br>-joined urls."""
    grouped: dict[str, list[dict]] = {}
    for problem in problems:
        grouped.setdefault(problem["reason"], []).append(problem)
    lines = [
        "# Problematic GitHub Repositories",
        "",
        f"Total: {len(problems)}",
        "",
    ]
    for reason in PROBLEM_REASON_LABELS:
        entries = grouped.get(reason)
        if not entries:
            continue
        lines.append(f"## {PROBLEM_REASON_LABELS[reason]} ({len(entries)})")
        lines.append("")
        lines.append("| Package | Repo identifier | URLs |")
        lines.append("| --- | --- | --- |")
        for entry in sorted(entries, key=lambda e: e["name"] or ""):
            urls = "<br>".join(
                f"{key}: {value}" for key, value in entry["urls"].items()
            )
            lines.append(
                f"| {entry['name']} | {entry['repo_identifier'] or ''} | {urls} |"
            )
        lines.append("")
    return "\n".join(lines)


def _atomic_write(path: str, text: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".rep.")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def write_problem_report(problems: list[dict], report_dir: str) -> None:
    """JSON + Markdown, exactly the reference's on-disk structure
    (``github.py:330-347``): ``github_problems.json`` =
    {"count": N, "problems": [...]} with indent=2 + sort_keys,
    ``github_problems.md`` = the grouped table. No files when there are
    no problems (the reference returns early)."""
    if not problems:
        return
    os.makedirs(report_dir, exist_ok=True)
    _atomic_write(
        os.path.join(report_dir, "github_problems.json"),
        json.dumps(
            {"count": len(problems), "problems": problems},
            indent=2,
            sort_keys=True,
        ),
    )
    _atomic_write(
        os.path.join(report_dir, "github_problems.md"),
        render_problem_markdown(problems),
    )


def _parts_dir(report_dir: str) -> str:
    return os.path.join(report_dir, "problems_parts")


def _collect_parts(report_dir: str) -> list[dict]:
    d = _parts_dir(report_dir)
    if not os.path.isdir(d):
        return []
    problems = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".jsonl"):
            continue
        with open(os.path.join(d, name)) as f:
            for line in f:
                line = line.strip()
                if line:
                    problems.append(json.loads(line))
    # deterministic report order regardless of partition arrival
    problems.sort(key=lambda p: (p["reason"], p["name"] or "", p["repo_identifier"] or ""))
    return problems


class ProblemReportStage:
    """map_batches stage: passes package batches through unchanged while
    side-writing problems incrementally. Each task appends a
    uniquely-named JSONL part (crash-safe — parts are never rewritten)
    and immediately re-renders the aggregate report from all parts
    visible so far: the distributed analog of the reference's
    flush-per-problem."""

    def __init__(self, report_dir: str):
        self.report_dir = report_dir
        os.makedirs(_parts_dir(report_dir), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        probs = problems_batch(batch)
        if probs.num_rows:
            rows = [
                {
                    "name": r["name"],
                    "repo_identifier": r["repo_identifier"],
                    "reason": r["reason"],
                    "urls": json.loads(r["urls_json"]),
                }
                for r in probs.to_pylist()
            ]
            part = os.path.join(
                _parts_dir(self.report_dir), f"part-{uuid.uuid4().hex}.jsonl"
            )
            with open(part, "w") as f:
                for row in rows:
                    f.write(json.dumps(row, sort_keys=True) + "\n")
                f.flush()
                os.fsync(f.fileno())
            # incremental visibility: the aggregate report reflects every
            # part flushed so far (atomic replace — readers never see a
            # torn file; concurrent tasks each rewrite a superset)
            write_problem_report(_collect_parts(self.report_dir), self.report_dir)
        return batch


def finalize_problem_report(report_dir: str) -> list[dict]:
    """The caller's ``finally`` — re-render from ALL parts and return
    the problems list (reference ``github.py:284-296``)."""
    problems = _collect_parts(report_dir)
    write_problem_report(problems, report_dir)
    return problems


def package_transform_with_report(
    sf_dir: str, report_dir: str, n: int = 24
) -> pa.Table:
    """The package enrich chain with the problems side artifact: chain
    actors transform, the report stage detects + flushes per batch, the
    report finalizes even when the run dies mid-pipeline."""
    import ray.data

    from ..sources.packages import synth_packages
    from ..stages.package_chain import PackageChain, validate_required

    try:
        ds = (
            ray.data.from_arrow(synth_packages(n))
            .map_batches(
                PackageChain, batch_format="pyarrow", batch_size=8, concurrency=2
            )
            .map_batches(validate_required, batch_format="pyarrow")
            .map_batches(
                ProblemReportStage,
                fn_constructor_args=(report_dir,),
                batch_format="pyarrow",
                batch_size=8,
                concurrency=1,
            )
        )
        import ray

        refs = ds.to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows] if refs else []
        return pa.concat_tables(tables) if tables else None
    finally:
        finalize_problem_report(report_dir)


# ---------------------------------------------------------------------------
# not-found fallback across versions (reference github.py:230-263,395-455)
# ---------------------------------------------------------------------------

RESOLVE_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("repo_identifier", pa.string()),
        ("resolved", pa.bool_()),
        ("fallback", pa.bool_()),
        ("reason", pa.string()),
    ]
)


def resolve_repo_with_fallback(versions: list[dict], repo_exists) -> dict:
    """One package's versions -> the reference's enrich resolution
    (``github.py:200-263``): the NEWEST version's repo identifier is
    primary. No GitHub-shaped URL anywhere on it = ``no_repo_url``; a
    malformed capture = ``malformed_identifier`` (the reference
    ``continue``s — malformed never falls back). A valid identifier
    that does not resolve (the 404 analog: ``repo_exists`` is False)
    falls back to the newest OTHER version whose distinct valid
    identifier resolves (``_find_working_repo_in_versions``,
    ``github.py:438-455``: newest-first walk, ``tried`` dedup); when no
    version resolves, the problem is ``not_found`` recorded against the
    PRIMARY identifier."""
    ordered = sorted(
        versions,
        key=lambda d: (d.get("upload_timestamp") or 0),
        reverse=True,
    )
    newest = ordered[0]
    name = newest.get("name")
    primary, reason = classify_repo_problem(newest)
    if reason is not None:
        return {
            "name": name,
            "repo_identifier": primary,
            "resolved": False,
            "fallback": False,
            "reason": reason,
        }
    if repo_exists(primary):
        return {
            "name": name,
            "repo_identifier": primary,
            "resolved": True,
            "fallback": False,
            "reason": None,
        }
    tried = {primary}
    for doc in ordered:
        identifier = tf.resolve_repo_identifier(doc)
        if not identifier or identifier in tried:
            continue
        tried.add(identifier)
        if repo_exists(identifier):
            return {
                "name": name,
                "repo_identifier": identifier,
                "resolved": True,
                "fallback": True,
                "reason": None,
            }
    return {
        "name": name,
        "repo_identifier": primary,
        "resolved": False,
        "fallback": False,
        "reason": "not_found",
    }


def resolve_repos_with_fallback(ds, known_repos: set[str], n_buckets: int = 64):
    """Distributed resolution over a docs Dataset: ONE row out per
    package. The known-repo set rides the object store once
    (``ray.put`` broadcast — never re-shipped per batch) and packages
    hash-bucket so the shuffle is a single coarse groupby and each
    Python dispatch covers a whole bucket of packages, not one
    (the relational.py ``_by_bucket`` scale shape)."""
    import zlib

    import numpy as np

    import ray

    repos_ref = ray.put(frozenset(known_repos))

    def add_bucket(t: pa.Table) -> pa.Table:
        names = t["name"].to_pylist()
        buckets = np.array(
            [zlib.crc32((n or "").encode()) % n_buckets for n in names],
            dtype=np.int64,
        )
        return t.append_column("bucket", pa.array(buckets))

    def resolve_bucket(t: pa.Table) -> pa.Table:
        known = ray.get(repos_ref)
        exists = known.__contains__
        by_name: dict[str, list[dict]] = {}
        for doc in t.to_pylist():
            by_name.setdefault(doc.get("name"), []).append(doc)
        rows = [
            resolve_repo_with_fallback(docs, exists)
            for _, docs in sorted(by_name.items(), key=lambda kv: kv[0] or "")
        ]
        return pa.table(
            {
                "name": pa.array([r["name"] for r in rows], pa.string()),
                "repo_identifier": pa.array(
                    [r["repo_identifier"] for r in rows], pa.string()
                ),
                "resolved": pa.array([r["resolved"] for r in rows], pa.bool_()),
                "fallback": pa.array([r["fallback"] for r in rows], pa.bool_()),
                "reason": pa.array([r["reason"] for r in rows], pa.string()),
            },
            schema=RESOLVE_SCHEMA,
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve_bucket, batch_format="pyarrow")
    )
