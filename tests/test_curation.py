"""Corpus-curation pipeline: precedence, planted cases, artifact write."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from pyf_aggregator_ray.pipelines import curation


@pytest.fixture(scope="module")
def curated(tmp_path_factory, ray_session):
    """Run curation + artifact write over a small corpus with planted
    exact dups, near dups, junk, and a non-english doc."""
    rng = np.random.default_rng(5)
    en = ["the", "and", "for", "with", "data", "table", "query", "merge",
          "sort", "batch", "value", "stream"]
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(en, size=60)))
    texts[10] = texts[3]          # exact dup of 3
    near = texts[5].split(); near[2] = "edited"
    texts[11] = " ".join(near)    # near dup of 5
    texts[12] = "x"               # low quality (tiny)
    texts[13] = " ".join(
        ["le", "la", "et", "les", "des", "une", "est"] * 10
    )                              # french stopwords -> non_english
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    sf_dir = str(tmp_path_factory.mktemp("curation_sf"))
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    out_dir = str(tmp_path_factory.mktemp("curated_out"))
    counts = curation.curate_and_write(sf_dir, out_dir)
    statuses = dict(
        zip(
            curation.curate_corpus(sf_dir).to_pandas()["doc_id"],
            curation.curate_corpus(sf_dir).to_pandas()["status"],
        )
    )
    return tbl, counts, statuses, out_dir


def test_planted_statuses(curated):
    _tbl, _counts, statuses, _out = curated
    assert statuses[10] == "exact_dup"   # duplicate of doc 3
    assert statuses[3] == "kept"         # keeper (min id) survives
    assert statuses[11] == "near_dup"    # minhash pair (5, 11) drops 11
    assert statuses[5] == "kept"
    assert statuses[12] == "low_quality"
    assert statuses[13] == "non_english"


def test_precedence_and_counts(curated):
    tbl, counts, statuses, _out = curated
    assert sum(counts.values()) == tbl.num_rows
    assert counts.get("exact_dup", 0) >= 1
    assert counts.get("near_dup", 0) >= 1
    assert counts["kept"] >= 30


def test_curated_artifact_matches_kept(curated):
    tbl, counts, statuses, out_dir = curated
    written = pq.read_table(out_dir).sort_by("doc_id")
    kept_ids = sorted(d for d, s in statuses.items() if s == "kept")
    assert written["doc_id"].to_pylist() == kept_ids
    assert written.num_rows == counts["kept"]


def test_curated_corpus_feeds_index_build(curated, tmp_path, ray_session):
    """The flagship chain: curated parquet artifact -> inverted-index
    build -> BM25 queries, with doc count equal to the kept set."""
    import pyarrow as pa

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index
    from pyf_aggregator_ray.pipelines.query import IndexReader
    from pyf_aggregator_ray.state import manifest as mf

    _tbl, counts, statuses, out_dir = curated

    def to_corpus(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "repo": pa.array(["org/curated"] * n),
                "path": pa.array([f"doc_{i}" for i in range(n)]),
                "commit": pa.array(["c0"] * n),
                "lang": pa.array(["en"] * n),
                "content": t["text"],
            }
        )

    corpus = ray.data.read_parquet(out_dir).map_batches(
        to_corpus, batch_format="pyarrow"
    )
    root = str(tmp_path / "curated_index")
    manifest = build_index(
        "", root, EngineConfig(), corpus=corpus, num_parts=2
    )
    assert manifest["stats"]["num_docs"] == counts["kept"]
    hits = IndexReader(root).score("data table", 5)
    assert hits  # the curated corpus is queryable
    kept = {d for d, s in statuses.items() if s == "kept"}
    assert all(doc in kept for _r, doc, _s in hits)
