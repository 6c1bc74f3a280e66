"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library code it calls) calls ``ray.init()`` /
``ray.shutdown()``.

``entry()`` runs the flagship pipeline (full inverted-index build over the
sf0.001 corpus + the BM25 reference query set). ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 via
pyf_aggregator_ray.pipelines.registry, with column-name-identical DuckDB
oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted
    index (tokenize -> salted groupby(term) -> delta-gap varint postings ->
    versioned segments + ALIAS) and answer the reference query set with
    BM25 top-k. Returns the top-k result table."""
    from pyf_aggregator_ray.pipelines.registry import bm25_topk

    return bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pyf_aggregator_ray.pipelines import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from pyf_aggregator_ray.pipelines import registry

    return registry.oracle_sql()
