"""Multimodal column handling: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns processed by **actor-pool**
``map_batches`` stages (decoder state loaded once per actor, small batches
sized for large payloads). The image/audio codec libraries are not in this
container, so the *decode kernel* is stubbed behind a deterministic fake
(clearly marked), while everything Ray-side — schema, actor signature,
batch sizing, broadcast of model state, output layout — is real and tested.

At 100 TB: payload columns dominate block size → ``batch_size`` is small
(64) and ``target_max_block_size`` should be raised so Arrow doesn't split
blocks absurdly; decode stages get ``num_cpus`` proportional to codec cost.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

THUMB_W = THUMB_H = 8   # fake "decoded" thumbnail size


def synth_media_dataset(sf_dir: str, n: int = 200):
    """Deterministic synthetic media table (payload:binary + metadata) —
    stands in for an image/audio lake partition."""
    import ray.data

    rng = np.random.default_rng(1234)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        payloads, kinds, sizes = [], [], []
        for i in ids:
            r = np.random.default_rng(1234 + int(i))
            size = int(r.integers(1_000, 20_000))
            payloads.append(r.integers(0, 256, size, dtype=np.uint8)
                            .tobytes())
            kinds.append(["image/png", "image/jpeg", "audio/wav"][i % 3])
            sizes.append(size)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })

    return (ray.data.range(n).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="numpy")
        .map_batches(gen, batch_format="pyarrow", batch_size=64))


class MediaDecoder:
    """Actor-pool decode/feature stage.

    __init__ loads the (stub) codec once per actor; __call__ decodes a
    batch. STUB: real decoding needs PIL/ffmpeg (not in this container) —
    the fake produces a deterministic 8x8 float32 'thumbnail' and feature
    stats from the payload bytes so the full pipeline (schema, shapes,
    actor reuse) is exercised end-to-end.
    """

    def __init__(self):
        try:  # pragma: no cover - the real path, absent in this container
            import PIL  # noqa: F401

            self.backend = "pil"
        except ImportError:
            self.backend = "stub"
        self.calls = 0

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # deterministic fake decode: payload bytes → 8x8 float32 in [0,1)
        h = hashlib.blake2b(payload, digest_size=THUMB_W * THUMB_H).digest()
        return (np.frombuffer(h, dtype=np.uint8)
                .reshape(THUMB_H, THUMB_W).astype(np.float32) / 256.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        thumbs, means, stds = [], [], []
        for payload in batch.column("payload").to_pylist():
            if self.backend != "stub":
                raise NotImplementedError(
                    "real image decode not available in this container")
            t = self._decode_stub(payload)
            thumbs.append(t.reshape(-1))
            means.append(float(t.mean()))
            stds.append(float(t.std()))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "thumb": pa.array([t.tolist() for t in thumbs],
                              pa.list_(pa.float32(), THUMB_W * THUMB_H)),
            "mean_intensity": pa.array(means, pa.float64()),
            "std_intensity": pa.array(stds, pa.float64()),
        })


def media_features(sf_dir: str):
    """Decode + feature-extract via the actor pool (small batches: payload
    rows are wide)."""
    ds = synth_media_dataset(sf_dir)
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          batch_size=64, concurrency=2)
