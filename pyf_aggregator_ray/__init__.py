"""pyf_aggregator_ray — a Ray-Data-native aggregate-then-index engine.

A from-scratch reimplementation of the *capabilities* of
``collective/pyf.aggregator`` (reference studied read-only at
``/root/reference``): aggregate → transform → index → enrich → query-top-k,
re-expressed as idiomatic Ray Data pipelines over Arrow batches.

The reference fetches package-version documents from registries and indexes
them into Typesense; this engine reads a Parquet corpus of source files
``(repo, path, commit, lang, content)``, builds a from-scratch inverted
index (delta-gap + varint compressed posting lists) via a skew-aware
``groupby(term)`` shuffle, and answers BM25 top-k queries (k1=1.2, b=0.75)
rank-identically to an exhaustive oracle.

Layout:
    sources/    corpus readers + deterministic synthesis
    functions/  pure vectorized kernels (varint, tokenizer, versions, text stats)
    stages/     map_batches / actor-pool stages (tokenize, postings, dedup, ann)
    state/      manifest / versioned index dirs / ALIAS swap / checkpoints
    pipelines/  end-to-end pipelines (build_index, query, relational, textpipes)
"""

__version__ = "0.1.0"
