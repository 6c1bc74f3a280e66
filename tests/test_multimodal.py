"""Multimodal plumbing: schema, actor stages, row-expanding frame sampling.
The codec is the documented deterministic fake; the Ray-side plumbing is
what these tests pin down."""

import pyarrow as pa
import pytest

import ray.data

from pyf_aggregator_ray.stages.multimodal import (
    HEADER,
    FrameSampleStage,
    ImageFeatureStage,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media():
    return synth_media_table(list(range(20)))


def test_synth_payloads_deterministic(media):
    again = synth_media_table(list(range(20)))
    assert media.equals(again)
    assert media["payload"].type == pa.large_binary()


def test_image_features_via_actor_pool(media):
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    tbl = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(tbl) == media.num_rows
    # decoded dims equal the metadata columns (header round-trip)
    assert tbl["decoded_width"].tolist() == media["width"].to_pylist()
    assert tbl["decoded_height"].tolist() == media["height"].to_pylist()
    for f in tbl["feature"]:
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-9


def test_bad_payload_raises():
    stage = ImageFeatureStage()
    bad = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([b"XXXX" + b"\0" * 16], type=pa.large_binary()),
        }
    )
    with pytest.raises(ValueError, match="bad media payload header"):
        stage(bad)


def test_frame_sampling_expands_rows(media):
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every": 4, "frame_bytes": 256},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    tbl = out.to_pandas()
    assert len(tbl) > media.num_rows  # one doc -> many frames
    # frame indices step by `every` and restart per doc
    for d, g in tbl.groupby("doc_id"):
        idx = sorted(g["frame_index"])
        assert idx[0] == 0
        assert all(b - a == 4 for a, b in zip(idx, idx[1:]))


def test_audio_features_via_actor_pool():
    from pyf_aggregator_ray.stages.multimodal import (
        AudioFeatureStage,
        synth_audio_table,
    )

    audio = synth_audio_table(list(range(16)))
    assert audio["payload"].type == pa.large_binary()
    out = (
        ray.data.from_arrow(audio)
        .map_batches(
            AudioFeatureStage, batch_format="pyarrow", batch_size=8, concurrency=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # header round-trip: decoded sample counts equal the metadata column
    assert out["n_samples"].tolist() == audio["n_samples"].to_pylist()
    # duration = samples / rate
    import numpy as np

    rates = np.array(audio["sample_rate"].to_pylist(), dtype=np.float64)
    assert np.allclose(out["duration_s"], out["n_samples"] / rates)
    # uint8 body centered at 128 -> rms in (0, 128]
    assert ((out["rms"] > 0) & (out["rms"] <= 128.0)).all()


def test_bad_audio_payload_raises():
    from pyf_aggregator_ray.stages.multimodal import AudioFeatureStage

    stage = AudioFeatureStage()
    bad = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([b"XXXX\0\0\0\0\0" + b"\0" * 32], type=pa.large_binary()),
        }
    )
    with pytest.raises(ValueError, match="bad audio payload header"):
        stage(bad)
