"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``large_binary`` columns
with typed metadata columns alongside. Decode/feature stages are
actor-pool ``map_batches`` classes whose Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested; the
codec itself is stubbed: the container has no image/audio libraries, so
``__init__`` probes for them (import-try) and, absent, uses a
clearly-marked DETERMINISTIC FAKE decoder that parses our synthetic
container header. Swapping in a real codec changes only ``_decode``.

Batch-size guidance for binary payloads: batches must be small enough
that ``batch_size × payload × concurrency`` fits the worker heap — pass
``batch_size=32..256`` for MB-scale payloads and let the object store
spill, never hold Python lists of frames.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"PYFA"
HEADER = struct.Struct(">4sHHB")  # magic, width, height, channels


def synth_media_table(doc_ids: list[int], seed: int = 42) -> pa.Table:
    """Deterministic synthetic 'image' payloads: a parseable header plus
    content bytes derived from sha256(doc_id, seed)."""
    payloads, widths, heights = [], [], []
    for d in doc_ids:
        h = hashlib.sha256(f"{seed}:{d}".encode()).digest()
        w = 64 + h[0] % 192
        ht = 64 + h[1] % 192
        body = (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3]
        payloads.append(HEADER.pack(MAGIC, w, ht, 3) + body)
        widths.append(w)
        heights.append(ht)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "media_type": pa.array(["image/x-pyfa"] * len(doc_ids)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(widths, type=pa.int64()),
            "height": pa.array(heights, type=pa.int64()),
        }
    )


class ImageFeatureStage:
    """Actor-pool stage: decode image payloads -> (dims, 16-bin byte
    histogram feature vector). Real-codec hook: if PIL is importable it
    would be used; in this container the deterministic fake decoder runs.
    """

    def __init__(self):
        try:  # pragma: no cover - library not present in this container
            import PIL.Image  # noqa: F401

            self.codec = "pil"
        except ImportError:
            self.codec = "fake"

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if self.codec == "pil":  # pragma: no cover
            raise NotImplementedError(
                "real PIL decode intentionally not implemented in-sandbox; "
                "plug in here when the codec library exists"
            )
        magic, w, h, c = HEADER.unpack(payload[: HEADER.size])
        if magic != MAGIC:
            raise ValueError("bad media payload header")
        body = np.frombuffer(payload[HEADER.size :], dtype=np.uint8)
        hist = np.bincount(body >> 4, minlength=16).astype(np.float64)
        hist /= max(1.0, hist.sum())
        return w, h, hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        dims_w, dims_h, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f = self._decode(payload)
            dims_w.append(w)
            dims_h.append(h)
            feats.append(f.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "decoded_width": pa.array(dims_w, type=pa.int64()),
                "decoded_height": pa.array(dims_h, type=pa.int64()),
                "feature": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


AUDIO_MAGIC = b"PYFA"
AUDIO_HEADER = struct.Struct(">4sIB")  # magic, sample_rate, channels


def synth_audio_table(doc_ids: list[int], seed: int = 42) -> pa.Table:
    """Deterministic synthetic 'audio' payloads: parseable header plus a
    mono 8-bit sample body derived from sha256(doc_id, seed) — sample
    rate and length vary per doc from the digest's leading bytes."""
    payloads, rates, lengths = [], [], []
    for d in doc_ids:
        h = hashlib.sha256(f"{seed}:{d}".encode()).digest()
        rate = 8000 * (1 + h[0] % 3)  # 8/16/24 kHz
        n = 4096 + h[1] * 64
        body = (h * (n // len(h) + 1))[:n]
        payloads.append(AUDIO_HEADER.pack(AUDIO_MAGIC, rate, 1) + body)
        rates.append(rate)
        lengths.append(n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "media_type": pa.array(["audio/x-pyfa"] * len(doc_ids)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "sample_rate": pa.array(rates, type=pa.int64()),
            "n_samples": pa.array(lengths, type=pa.int64()),
        }
    )


class AudioFeatureStage:
    """Actor-pool stage: decode audio payloads -> (sample count, duration,
    RMS amplitude). Real-codec hook mirrors ImageFeatureStage: if
    soundfile/librosa were importable they'd decode here; in this
    container the deterministic fake header/body parser runs."""

    def __init__(self):
        try:  # pragma: no cover - library not present in this container
            import soundfile  # noqa: F401

            self.codec = "soundfile"
        except ImportError:
            self.codec = "fake"

    def _decode(self, payload: bytes) -> tuple[int, float, float]:
        if self.codec == "soundfile":  # pragma: no cover
            raise NotImplementedError(
                "real audio decode intentionally not implemented in-sandbox; "
                "plug in here when the codec library exists"
            )
        magic, rate, _ch = AUDIO_HEADER.unpack(payload[: AUDIO_HEADER.size])
        if magic != AUDIO_MAGIC:
            raise ValueError("bad audio payload header")
        body = np.frombuffer(payload[AUDIO_HEADER.size :], dtype=np.uint8)
        n = len(body)
        duration = n / rate
        rms = float(np.sqrt(np.sum((body.astype(np.float64) - 128.0) ** 2) / n))
        return n, duration, rms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ns, durs, rmss = [], [], []
        for payload in batch["payload"].to_pylist():
            n, dur, rms = self._decode(payload)
            ns.append(n)
            durs.append(dur)
            rmss.append(rms)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "duration_s": pa.array(durs, type=pa.float64()),
                "rms": pa.array(rmss, type=pa.float64()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: 'video' payload -> one row PER SAMPLED FRAME
    (row-expanding map_batches, the reference's flat_map shape
    ``npm_fetcher.py:664-702``: one input doc -> N output rows).

    The frame digest is sha256 over the frame's lowercase HEX encoding
    (not the raw bytes): DuckDB's sha256 accepts only VARCHAR, and
    hashing the hex string keeps the fingerprint independently
    computable by the SQL oracle while remaining a faithful content
    digest."""

    def __init__(self, every: int = 4, frame_bytes: int = 256):
        self.every = every
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, digests = [], [], []
        for d, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            body = payload[HEADER.size :]
            n_frames = max(1, len(body) // self.frame_bytes)
            for i in range(0, n_frames, self.every):
                frame = body[i * self.frame_bytes : (i + 1) * self.frame_bytes]
                ids.append(d)
                frame_idx.append(i)
                digests.append(
                    hashlib.sha256(frame.hex().encode()).hexdigest()[:16]
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(frame_idx, type=pa.int64()),
                "frame_digest": pa.array(digests, type=pa.string()),
            }
        )
