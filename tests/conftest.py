"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging
import shutil

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_corpus_table():
    from pyf_aggregator_ray.sources.corpus import synth_corpus

    return synth_corpus(n_rows=300, seed=42)


@pytest.fixture(scope="session")
def built_index(tmp_path_factory, synth_corpus_table):
    """Index built over the synthetic corpus with aggressive salting
    (low hot threshold + small ranges) so the skew path is exercised."""
    import ray.data

    from pyf_aggregator_ray.config import EngineConfig
    from pyf_aggregator_ray.pipelines.build_index import build_index

    root = str(tmp_path_factory.mktemp("index_root"))
    cfg = EngineConfig(hot_df_threshold=20, salt_range_docs=40)
    corpus = ray.data.from_arrow(synth_corpus_table)
    manifest = build_index("", root, cfg, corpus=corpus, num_parts=8)
    yield root, cfg, manifest
    shutil.rmtree(root, ignore_errors=True)


SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
