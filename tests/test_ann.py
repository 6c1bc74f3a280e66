"""ANN: brute-force exactness vs numpy oracle; LSH recall sanity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pyf_aggregator_ray.functions.rounding import round6
from pyf_aggregator_ray.stages import ann


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(42)
    n, dim = 200, 16
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m[7] = m[3] * 2.0  # same direction as 3 -> cosine 1.0
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in m], type=pa.list_(pa.float32())
            ),
        }
    )


def numpy_oracle(tbl, qids, k):
    m = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = []
    for q in qids:
        cos = round6(m @ m[q])
        order = np.lexsort((np.arange(len(m)), -cos))[:k]
        out.extend(
            (q, r + 1, int(v), float(cos[v])) for r, v in enumerate(order)
        )
    return out


def test_brute_force_matches_oracle(emb_table):
    ds = ray.data.from_arrow(emb_table)
    got = ann.brute_force_topk(ds, [0, 3, 50], 5)
    rows = list(
        zip(
            got["query_vec_id"].to_pylist(),
            got["rank"].to_pylist(),
            got["vec_id"].to_pylist(),
            got["cosine"].to_pylist(),
        )
    )
    assert rows == numpy_oracle(emb_table, [0, 3, 50], 5)


def test_scaled_vector_ties(emb_table):
    """vec 7 = 2 * vec 3: cosine(3,7)=1.0; rank ties break by vec_id."""
    ds = ray.data.from_arrow(emb_table)
    got = ann.brute_force_topk(ds, [3], 3)
    assert got["vec_id"].to_pylist()[:2] == [3, 7]
    assert got["cosine"].to_pylist()[0] == 1.0
    assert got["cosine"].to_pylist()[1] == 1.0


def test_partial_topk_invariant_to_block_count(emb_table):
    """Local top-k + merge must be invariant to input partitioning."""
    one = ann.brute_force_topk(ray.data.from_arrow(emb_table), [0, 9], 7)
    many = ann.brute_force_topk(
        ray.data.from_arrow(emb_table).repartition(13), [0, 9], 7
    )
    assert one.equals(many)


def test_lsh_recall(emb_table):
    ds = ray.data.from_arrow(emb_table)
    exact = ann.brute_force_topk(ds, [0, 3, 50], 5)
    approx = ann.lsh_bucketed_topk(ds, [0, 3, 50], 5)
    # self is always found (same bucket), schema identical
    assert approx.schema.names == exact.schema.names
    by_q = {}
    for q, v in zip(
        approx["query_vec_id"].to_pylist(), approx["vec_id"].to_pylist()
    ):
        by_q.setdefault(q, set()).add(v)
    for q in (0, 3, 50):
        assert q in by_q[q]
    # recall vs exact top-5 should be nontrivial (>40% across queries)
    exact_by_q = {}
    for q, v in zip(
        exact["query_vec_id"].to_pylist(), exact["vec_id"].to_pylist()
    ):
        exact_by_q.setdefault(q, set()).add(v)
    recall = np.mean(
        [len(by_q[q] & exact_by_q[q]) / len(exact_by_q[q]) for q in (0, 3, 50)]
    )
    assert recall > 0.4


def test_cosine_near_dup_pairs(emb_table, ray_session):
    """Exact embedding-cosine near-dup equals a local all-pairs oracle;
    the planted same-direction pair is found with cosine 1.0."""
    ds = ray.data.from_arrow(emb_table).repartition(4)
    got = ann.cosine_near_dup_pairs(ds, threshold=0.8)
    pairs = list(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    m = np.array(emb_table["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    expected = [
        (a, b)
        for a in range(len(m))
        for b in range(a + 1, len(m))
        if cos[a, b] >= 0.8
    ]
    assert pairs == expected
    assert (3, 7) in pairs
    d = dict(zip(pairs, got["cosine"].to_pylist()))
    assert d[(3, 7)] == 1.0
    # every reported cosine matches the oracle after round6
    for (a, b), c in d.items():
        assert c == round6(cos[a, b])


def test_ivf_recall(emb_table, ray_session):
    """IVF-bucketed ANN: self always found, recall vs exact nontrivial,
    every candidate genuinely belongs to a probed centroid."""
    ds = ray.data.from_arrow(emb_table).repartition(4)
    exact = ann.brute_force_topk(ds, [0, 3, 50], 5)
    approx = ann.ivf_topk(ds, [0, 3, 50], 5, num_centroids=8, nprobe=3)
    assert approx.schema.names == exact.schema.names
    by_q, exact_by_q = {}, {}
    for q, v in zip(approx["query_vec_id"].to_pylist(), approx["vec_id"].to_pylist()):
        by_q.setdefault(q, set()).add(v)
    for q, v in zip(exact["query_vec_id"].to_pylist(), exact["vec_id"].to_pylist()):
        exact_by_q.setdefault(q, set()).add(v)
    for q in (0, 3, 50):
        assert q in by_q[q]  # the query's own cluster is always probed
    recall = np.mean(
        [len(by_q[q] & exact_by_q[q]) / len(exact_by_q[q]) for q in (0, 3, 50)]
    )
    assert recall > 0.4


def test_banded_near_dup_recall_and_precision(ray_session):
    """LSH-banded near-dup vs the exact all-pairs oracle on a clustered
    corpus: precision is 1.0 (every emitted pair re-verified >= threshold)
    and banding recall is high at the configured plane/band split."""
    rng = np.random.default_rng(11)
    n, dim = 400, 64
    base = rng.standard_normal((20, dim))
    rows = []
    for i in range(n):
        c = base[i % 20]
        rows.append(c + 0.55 * rng.standard_normal(dim))
    m = np.array(rows, dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    thr = 0.4
    exact = ann.cosine_near_dup_pairs(ds, thr)
    banded = ann.banded_cosine_near_dup(ds, thr)
    exact_pairs = set(zip(exact["doc_a"].to_pylist(), exact["doc_b"].to_pylist()))
    banded_pairs = set(zip(banded["doc_a"].to_pylist(), banded["doc_b"].to_pylist()))
    assert exact_pairs, "fixture must contain near-dup pairs"
    # precision: banded emits only true >=threshold pairs
    assert banded_pairs <= exact_pairs
    # recall: the 16x4-bit banding keeps the overwhelming majority
    recall = len(banded_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"banding recall {recall:.3f}"
    # cosines agree with the exact path on shared pairs
    ecos = {
        (a, b): c
        for a, b, c in zip(
            exact["doc_a"].to_pylist(),
            exact["doc_b"].to_pylist(),
            exact["cosine"].to_pylist(),
        )
    }
    for a, b, c in zip(
        banded["doc_a"].to_pylist(),
        banded["doc_b"].to_pylist(),
        banded["cosine"].to_pylist(),
    ):
        assert abs(ecos[(a, b)] - c) < 1e-12


def test_banded_near_dup_no_full_matrix_broadcast(ray_session, monkeypatch):
    """Scale guard: the banded path must never assemble the O(N·d) full
    normalized matrix (the exact path's broadcast). 50k vectors with
    planted duplicate pairs complete through banding + candidate-restricted
    verification with the full-matrix task poisoned."""

    def _poisoned(*a, **k):
        raise AssertionError("banded path must not build the full matrix")

    monkeypatch.setattr(ann, "_normalized_matrix_task", _poisoned)

    rng = np.random.default_rng(5)
    n, dim = 50_000, 16
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # plant 25 exact-duplicate pairs (cosine 1.0 >= any threshold)
    planted = [(2 * i, 2 * i + 1) for i in range(0, 50, 2)]
    for a, b in planted:
        m[b] = m[a]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    # wide bands (4 x 16 bits): random 16-dim pairs almost never collide,
    # identical vectors always do — candidate volume stays tiny at 50k
    got = ann.banded_cosine_near_dup(
        ds, 0.99, num_planes=64, num_bands=4
    )
    pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    for p in planted:
        assert p in pairs


def test_ivf_trained_codebook_recall_floor(ray_session):
    """k-means-trained IVF on a clustered distribution: with a codebook
    matching the true cluster count, nprobe=2 recall vs brute force
    clears a floor an untrained random codebook is not held to."""
    rng = np.random.default_rng(21)
    n_clusters, per, dim = 8, 60, 32
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    rows = []
    for i in range(n_clusters * per):
        rows.append(centers[i % n_clusters] + 0.3 * rng.standard_normal(dim))
    m = np.array(rows, dtype=np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(m)), type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in m], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    qids = [0, 5, 123, 250, 401]
    k = 10
    exact = ann.brute_force_topk(ds, qids, k)
    trained = ann.train_ivf_centroids(ds, n_clusters, sample_n=480)
    # determinism: same inputs -> identical codebook
    trained2 = ann.train_ivf_centroids(ds, n_clusters, sample_n=480)
    np.testing.assert_array_equal(trained, trained2)
    approx = ann.ivf_topk(ds, qids, k, nprobe=2, centroids=trained)
    exact_by_q, by_q = {}, {}
    for q, v in zip(exact["query_vec_id"].to_pylist(), exact["vec_id"].to_pylist()):
        exact_by_q.setdefault(q, set()).add(v)
    for q, v in zip(approx["query_vec_id"].to_pylist(), approx["vec_id"].to_pylist()):
        by_q.setdefault(q, set()).add(v)
    recall = np.mean(
        [len(by_q.get(q, set()) & exact_by_q[q]) / len(exact_by_q[q]) for q in qids]
    )
    assert recall >= 0.9, f"trained IVF recall {recall:.3f}"


def test_ann_artifacts_serve_after_embeddings_deleted(ray_session, tmp_path):
    """Round-4: persisted ANN artifacts (IVF centroids + cluster lists,
    LSH bucket table) must serve queries IDENTICAL to the direct paths,
    from the artifact alone — the embeddings table is deleted after the
    build (the corpus-deleted pattern fieldsearch uses)."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    rng = np.random.default_rng(7)
    n, dim = 400, 16
    vecs = rng.standard_normal((n, dim))
    emb_path = str(tmp_path / "embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        ),
        emb_path,
    )
    emb = ray.data.read_parquet(emb_path)
    init_ids = [3, 40, 77, 111, 150, 200, 230, 250]
    qids, k, nprobe, planes = [0, 5, 123], 7, 3, 6

    # direct (recompute-per-call) reference results
    direct_ivf = ann.ivf_trained_topk(
        emb, qids, k, init_ids, sample_n=256, iters=4, nprobe=nprobe
    )
    direct_lsh = ann.lsh_bucketed_topk(emb, qids, k, num_planes=planes)

    vdir = str(tmp_path / "v1")
    os.makedirs(vdir)
    art = ann.build_ann_artifacts(
        emb, vdir, init_ids, sample_n=256, iters=4, num_planes=planes
    )
    os.remove(emb_path)  # the query path must not need the table

    ivf_stage = ann.IvfArtifactStage(art, nprobe=nprobe)
    lsh_stage = ann.LshArtifactStage(art, num_planes=planes)
    got_ivf = ivf_stage.topk(qids, k)
    got_lsh = lsh_stage.topk(qids, k)

    for got, want in ((got_ivf, direct_ivf), (got_lsh, direct_lsh)):
        g = got.to_pandas().sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
        w = want.to_pandas().sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
        assert g["vec_id"].tolist() == w["vec_id"].tolist()
        assert np.allclose(g["cosine"], w["cosine"])
