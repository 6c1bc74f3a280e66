"""Code-aware tokenizer, fully Arrow-vectorized.

Reproduces the reference's tokenization semantics — Typesense
``token_separators: [".", "-", "_", "@", "/"]`` plus default
whitespace/punctuation splitting and lowercasing
(``/root/reference/src/pyf/aggregator/db.py:241``) — as a single rule:

    lowercase, then a token is a maximal run of ``[a-z0-9]``.

So ``plone.api`` -> ``plone api`` and ``@plone/volto`` -> ``plone volto``,
exactly like the reference's search splitting. The same rule is expressed
in the DuckDB oracle as ``regexp_extract_all(lower(x), '[a-z0-9]+')``
(both Arrow and DuckDB use RE2, so the two sides agree byte-for-byte).

All kernels here are pyarrow.compute / numpy — no Python per-row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Splitting on the complement of the token class is equivalent to extracting
# runs of the class, modulo empty strings at the edges (filtered below).
_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize_column(content: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """string column -> list<string> of lowercase tokens (empties removed)."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(content, ""))
    split = pc.split_pattern_regex(lowered, _SPLIT_PATTERN)
    # drop empty tokens produced at string edges
    flat = split.flatten()
    keep_np = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = split.value_parent_indices().to_numpy(zero_copy_only=False)
    new_counts = np.bincount(parent[keep_np], minlength=len(split))
    new_offsets = np.concatenate(([0], np.cumsum(new_counts)))
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int64()),
        flat.filter(pa.array(keep_np)),
    )


def doc_lengths(tokens: pa.ListArray) -> pa.Array:
    """list<string> -> int64 token count per doc (the BM25 ``dl``)."""
    return pc.cast(pc.list_value_length(tokens), pa.int64())


def term_frequencies(
    tokens: pa.ListArray, doc_ids: pa.Array | np.ndarray
) -> pa.Table:
    """Explode token lists into exact per-document term frequencies.

    Returns a table ``(term: string, doc_id: int64, tf: int64)`` with one
    row per distinct (term, doc) pair — the raw postings stream. Grouping
    is done with Arrow's C++ hash aggregation (``Table.group_by``), not a
    Python loop.
    """
    flat_terms = tokens.flatten()
    parent = tokens.value_parent_indices()
    doc_arr = pa.array(np.asarray(doc_ids, dtype=np.int64))
    flat_docs = pc.take(doc_arr, parent)
    tbl = pa.table({"term": flat_terms, "doc_id": flat_docs})
    # use_threads=False: this runs INSIDE a map_batches worker — the
    # default spawns a full-size Acero thread pool PER worker (30 workers
    # x 32 threads thrashed the 32-core box); Ray supplies the
    # parallelism, the per-batch kernel must stay single-threaded
    out = tbl.group_by(["term", "doc_id"], use_threads=False).aggregate(
        [("doc_id", "count")]
    )
    return out.rename_columns(["term", "doc_id", "tf"]).set_column(
        2, "tf", pc.cast(out.column(2), pa.int64())
    )


def tokenize_query(query: str) -> list[str]:
    """Tokenize one query string with the same rule; distinct terms, sorted.

    BM25 here scores each *distinct* query term once (query-tf ignored),
    matching the SQL oracle; sorting makes float summation order
    deterministic across engines.
    """
    import re

    return sorted(set(re.findall("[a-z0-9]+", query.lower())))
