"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a ``media_type``
metadata column; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The decode libraries (PIL/ffmpeg/etc.) are
NOT in this container, so the decode kernel is STUBBED: with
``use_stub=True`` (default) it produces a deterministic fake feature vector
(blake2b of the payload bytes -> 8 float32s) so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested;
with ``use_stub=False`` it raises NotImplementedError where the real decoder
would be plugged in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # e.g. "image/png", "audio/wav"
        ("content", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 8


def _stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake embedding: 8 float32 in [0,1) from blake2b bytes."""
    digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    raw = np.frombuffer(digest, dtype=np.uint32)
    return (raw / np.float32(2**32)).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media.

    Real deployment: ``__init__`` loads the decoder/model ONCE per actor
    (this is why it is a callable class, not a function); ``__call__``
    processes a batch. Use small ``batch_size`` — payloads are large.
    """

    def __init__(self, use_stub: bool = True, target_size: tuple[int, int] = (224, 224)):
        self.use_stub = use_stub
        self.target_size = target_size
        if not use_stub:
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg — not available in this "
                "environment; plug the decoder in here (loaded once per actor)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "content" not in batch.column_names:
            return pa.schema(
                [("media_id", pa.int64()), ("media_type", pa.string()),
                 ("features", pa.list_(pa.float32(), FEATURE_DIM))]
            ).empty_table()
        feats = [
            _stub_features(c if c is not None else b"")
            for c in batch["content"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), FEATURE_DIM)
                ),
            }
        )


def extract_media_features(
    media: ray.data.Dataset,
    batch_size: int = 64,
    concurrency: int = 4,
    num_cpus: float = 1.0,
) -> ray.data.Dataset:
    """media table -> (media_id, media_type, features). Small batches —
    payloads are MBs; concurrency x batch_size x payload must fit the heap."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"use_stub": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def synthesize_media(n: int = 64, seed: int = 42) -> ray.data.Dataset:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * 64  # 2 KiB payload
        rows.append(
            {
                "media_id": i,
                "media_type": "image/png" if i % 2 == 0 else "audio/wav",
                "content": payload,
                "width": 640,
                "height": 480,
            }
        )
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
