"""Synthetic package-metadata fixture (FIXTURES.md §3).

A deterministic, seeded table mirroring the reference's sample documents
(``/root/reference/tests/conftest.py:33-94``) translated to Arrow: dotted
and scoped names, golden version vectors, classifier lists with
Framework/Python entries, markdown descriptions with headings, links,
images and Changelog sections, empty-metadata rows, pypi/npm registry mix.
Used by the transform-chain tests and the ``package_transform`` pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VERSIONS = ["1.0.3", "2.1.2", "2.1.3", "2.1.5", "12.5.9", "2.0.0a1", "2.0.0b1", "2.0.0"]

_DESCRIPTION_TEMPLATE = """# {name}

A [great]({url}) package for things. ![badge](https://img.shields.io/x.svg)

## Usage

Import it and call functions. More words here to pad the documentation
content so scoring buckets are exercised for {name}.

## Changelog

- 1.0: first release
- 0.9: beta
"""

_RST_TEMPLATE = """{name}
{underline}

A great package for things, documented in reStructuredText.

Usage
-----

Import it and call ``functions`` for {name}.
See `the docs <https://docs.example.org/{name}>`_.

Changelog
---------

- 1.0: first release
"""


def _rst_description(name: str) -> str:
    return _RST_TEMPLATE.format(name=name, underline="=" * (len(name) + 2))


def synth_packages(n: int = 24, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    names, versions, classifiers, descriptions = [], [], [], []
    summaries, licenses, authors, maintainers = [], [], [], []
    timestamps, registries, urls, keywords = [], [], [], []
    content_types: list[str | None] = []
    contributors: list[list[dict]] = []
    base_names = ["plone.api", "@plone/volto", "requests", "flask-login",
                  "zope.interface", "left-pad"]
    repo_urls = [
        "https://github.com/plone/plone.api",
        "git+https://github.com/plone/volto.git",
        "git@github.com:psf/requests.git",
        "git://github.com/maxcountryman/flask-login.git",
        "git+ssh://git@github.com/zopefoundation/zope.interface.git",
        "https://github.com/about/invalid",  # reserved owner -> rejected
    ]
    for i in range(n):
        name = base_names[i % len(base_names)]
        version = VERSIONS[i % len(VERSIONS)]
        names.append(name)
        versions.append(version)
        cls = []
        if i % 3 != 0:
            cls.append("Framework :: Plone :: 6.0")
        if i % 2 == 0:
            cls.append("Programming Language :: Python :: 3.11")
            cls.append("Programming Language :: Python :: 3.12")
        if i % 5 == 0:
            cls.append("Development Status :: 5 - Production/Stable")
        classifiers.append(cls)
        if i % 7 == 0:
            descriptions.append(None)  # null-description branch
            content_types.append("text/markdown")
        elif i % 6 == 0:
            descriptions.append("plain text without any headings at all")
            content_types.append("text/plain")
        elif i % 5 == 4:
            # rst rows: explicit content type on one, the reference's
            # default-to-rst branch (None content type) on the others
            descriptions.append(_rst_description(name))
            content_types.append("text/x-rst" if i % 10 == 4 else None)
        else:
            descriptions.append(
                _DESCRIPTION_TEMPLATE.format(name=name, url=repo_urls[i % len(repo_urls)])
            )
            content_types.append("text/markdown")
        summaries.append("" if i % 4 == 0 else f"The {name} package")
        licenses.append(None if i % 5 == 0 else "GPL")
        authors.append("" if i % 3 == 0 else "Jane Dev")
        maintainers.append(None)
        # deterministic spread across the recency buckets
        timestamps.append(
            None if i % 8 == 0 else 1_700_000_000 - int(rng.integers(0, 900)) * 86_400
        )
        registries.append("npm" if name.startswith("@") or name == "left-pad" else "pypi")
        urls.append(repo_urls[i % len(repo_urls)])
        keywords.append("web, plone  cms" if i % 2 == 0 else None)
        # nested column (reference db.py:233-238 contributors object[]):
        # 0..6 entries, usernames distinct within a row
        contributors.append(
            [
                {
                    "username": f"user{(i + j) % 10}",
                    "avatar_url": f"https://avatars.example.org/u{(i + j) % 10}",
                    "contributions": int(((i + 1) * (j + 2) * 7) % 50),
                }
                for j in range((i * 3) % 7)
            ]
        )
    return pa.table(
        {
            "name": pa.array(names),
            "version": pa.array(versions),
            "classifiers": pa.array(classifiers, type=pa.list_(pa.string())),
            "description": pa.array(descriptions, type=pa.string()),
            "description_content_type": pa.array(content_types, type=pa.string()),
            "summary": pa.array(summaries, type=pa.string()),
            "license": pa.array(licenses, type=pa.string()),
            "author": pa.array(authors, type=pa.string()),
            "maintainer": pa.array(maintainers, type=pa.string()),
            "upload_timestamp": pa.array(timestamps, type=pa.int64()),
            "registry": pa.array(registries),
            "home_page": pa.array(urls),
            "keywords": pa.array(keywords, type=pa.string()),
            "contributors": pa.array(
                contributors,
                type=pa.list_(
                    pa.struct(
                        [
                            ("username", pa.string()),
                            ("avatar_url", pa.string()),
                            ("contributions", pa.int64()),
                        ]
                    )
                ),
            ),
        }
    )
