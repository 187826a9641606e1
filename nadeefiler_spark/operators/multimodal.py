"""Multimodal binary-column plumbing: metadata extraction, decode
dispatch, frame/feature sampling — Arrow-batched, schema-stable.

Opaque media (image/audio/video) live as `binary` columns with typed
metadata beside them (the clips table is the audio instance). The
Spark-side plumbing here is real and tested: schemas, mapInPandas batch
shapes, partitioning. The image/video DECODE step is a clearly-marked
STUB (`NotImplementedError`) because the container ships no imaging
libraries — a production build plugs Pillow/ffmpeg into
`_decode_image` and nothing else changes. Audio decode is fully real
(see nadeefiler_spark.audio).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

BINARY_META_SCHEMA = (
    "id string, n_bytes bigint, magic_hex string, digest string, kind string"
)

_MAGIC_KINDS = {
    b"RIFF": "audio/wav",
    b"NDF1": "audio/ndf-fake",
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"\x00\x00\x00\x18": "video/mp4",
    b"\x00\x00\x00\x20": "video/mp4",
}


def _sniff_kind(blob: bytes) -> str:
    for magic, kind in _MAGIC_KINDS.items():
        if blob[: len(magic)] == magic:
            return kind
    return "application/octet-stream"


def binary_meta(df: DataFrame, id_col: str, bin_col: str,
                digest: str = "sha1") -> DataFrame:
    """Per-blob metadata (size, magic, digest, sniffed kind) — one
    narrow Arrow pass, no shuffle. ``digest`` is any hashlib algorithm
    (sha256 keeps the result comparable with engines whose digest
    functions hash UTF-8 text, e.g. DuckDB's sha256(VARCHAR))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, magics, digests, kinds = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob) if blob is not None else b""
                ids.append(str(i))
                sizes.append(len(b))
                magics.append(b[:4].hex())
                digests.append(hashlib.new(digest, b).hexdigest())
                kinds.append(_sniff_kind(b))
            yield pd.DataFrame(
                {"id": ids, "n_bytes": sizes, "magic_hex": magics,
                 "digest": digests, "kind": kinds}
            )

    return df.select(id_col, bin_col).mapInPandas(run, BINARY_META_SCHEMA)


IMAGE_FEATURES_SCHEMA = "id string, width int, height int, mean_lum double"


def _decode_image(blob: bytes) -> tuple[int, int, bytes]:  # pragma: no cover
    """STUB: real image decode needs Pillow/libvips on executors —
    unavailable in this container. Production: `Image.open(BytesIO(...))`.
    The deterministic fake format below keeps the pipeline testable."""
    if blob[:4] == b"NDFI":  # deterministic fake image: w,h uint16 + gray bytes
        w, h = struct.unpack_from("<HH", blob, 4)
        return w, h, blob[8 : 8 + w * h]
    raise NotImplementedError("real image decode requires Pillow/libvips on executors")


def encode_fake_image(w: int, h: int, pixels: bytes) -> bytes:
    """Deterministic fake image container for plumbing tests."""
    return b"NDFI" + struct.pack("<HH", w, h) + pixels[: w * h]


def image_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Decode + feature-extract (width/height/mean luminance) per image.

    Real Spark plumbing over the stubbed decode: works on the fake
    container, raises cleanly per-row on real formats (error rows get
    width = -1 so the pipeline keeps flowing — a validator can filter).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, lums = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                ids.append(str(i))
                try:
                    w, h, px = _decode_image(bytes(blob))
                    ws.append(w)
                    hs.append(h)
                    lums.append(sum(px) / max(len(px), 1))
                except NotImplementedError:
                    ws.append(-1)
                    hs.append(-1)
                    lums.append(None)
            yield pd.DataFrame({"id": ids, "width": ws, "height": hs, "mean_lum": lums})

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)
