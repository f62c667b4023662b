"""Multimodal columns: image/audio/video as opaque ``binary`` +
typed metadata (SURVEY.md "beyond the reference" set).

The Spark-side plumbing — schema, partition sizing, Arrow batch
shape, UDF signatures — is real and tested; the actual codec calls
are STUBBED behind ``MediaCodec`` because image/audio libraries are
not available in this container. ``DeterministicFakeCodec`` produces
seed-stable outputs so tests pin the full dataflow; a production
deployment swaps in a Pillow/ffmpeg/torchvision codec with the same
interface and nothing else changes.

Scale notes:
* media rows are WIDE (payload bytes) — the operators explicitly
  repartition by ``hash(media_id)`` and size Arrow batches via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
  decoded frames fits executor memory;
* decode/feature stages are ``mapInPandas`` (streaming iterator —
  never materializes a whole partition of payloads);
* metadata-only transforms (filtering by mime, size bands, frame
  counts) are native expressions against the typed metadata struct,
  so Catalyst prunes payload bytes out of scans that don't need them
  (`ReadSchema` shows only the metadata struct).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id string, payload binary, "
    "meta struct<mime:string, width:int, height:int, "
    "duration_ms:int, n_frames:int>"
)

FEATURES_DDL = (
    "media_id string, kind string, feature array<float>, "
    "out_width int, out_height int"
)

FRAMES_DDL = "media_id string, frame_idx int, frame_sha string"

AHASH_DDL = "media_id string, ahash long"


class MediaCodec:
    """Codec interface. Production: Pillow/ffmpeg. Tests: the fake."""

    def decode_image(self, payload: bytes) -> "np.ndarray":
        raise NotImplementedError(
            "real image decoding requires an image library not present "
            "in this environment — plug a Pillow/OpenCV codec here"
        )

    def sample_frames(self, payload: bytes, n: int) -> list[bytes]:
        raise NotImplementedError(
            "real video decoding requires ffmpeg — plug a codec here"
        )


class DeterministicFakeCodec(MediaCodec):
    """Seed-stable stand-in: 'decodes' payload bytes into a small
    deterministic pixel array / frame list derived from their hash.
    Exercises exactly the same batch shapes as a real codec."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        h = hashlib.md5(payload or b"").digest()
        side = 8 + h[0] % 8
        rng = np.frombuffer(
            hashlib.sha256(payload or b"").digest() * ((side * side * 3) // 32 + 1),
            dtype=np.uint8,
        )[: side * side * 3]
        return rng.reshape(side, side, 3)

    def sample_frames(self, payload: bytes, n: int) -> list[bytes]:
        return [
            hashlib.md5((payload or b"") + bytes([i])).digest() for i in range(n)
        ]


class ChainedFakeCodec(DeterministicFakeCodec):
    """Fake codec with FULL-entropy pixels: the pixel stream is a
    sha256 counter chain (block i = sha256(payload ‖ le32(i))), never
    a repeated digest. DeterministicFakeCodec tiles ONE 32-byte
    digest across the array, which collapses a 64-bit perceptual
    hash to ~23 effective bits (measured: 2 aHash collisions among
    4,764 distinct payloads) — fine for dataflow pins, fatal for a
    dedup whose certificate is 'distinct content ⇒ distinct code'.
    Use this fake wherever the TEST depends on hash entropy."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        p = payload or b""
        side = 8 + hashlib.md5(p).digest()[0] % 8
        need = side * side * 3
        blocks = []
        for i in range((need + 31) // 32):
            blocks.append(
                hashlib.sha256(p + i.to_bytes(4, "little")).digest()
            )
        raw = np.frombuffer(b"".join(blocks), dtype=np.uint8)[:need]
        return raw.reshape(side, side, 3)


def image_features(
    media: DataFrame,
    codec: MediaCodec | None = None,
    resize_to: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """decode → resize (mean-pool) → channel-mean feature vector.
    One Arrow-batched stage; payload never leaves the executor."""
    codec = codec or DeterministicFakeCodec()
    p = partitions or media.sparkSession.sparkContext.defaultParallelism

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "feature": [],
                   "out_width": [], "out_height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = codec.decode_image(bytes(payload) if payload is not None else b"")
                h, w = img.shape[:2]
                # mean-pool resize to (resize_to, resize_to)
                ys = np.linspace(0, h, resize_to + 1, dtype=int)
                xs = np.linspace(0, w, resize_to + 1, dtype=int)
                feat = [
                    float(img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean())
                    for i in range(resize_to)
                    for j in range(resize_to)
                ]
                out["media_id"].append(mid)
                out["kind"].append("image_meanpool")
                out["feature"].append(feat)
                out["out_width"].append(resize_to)
                out["out_height"].append(resize_to)
            yield pd.DataFrame(out)

    wide = media.select("media_id", "payload").repartition(p, F.hash("media_id"))
    return wide.mapInPandas(stage, schema=FEATURES_DDL)


def sample_video_frames(
    media: DataFrame,
    codec: MediaCodec | None = None,
    frames_per_video: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """frame-sample stage: one row per sampled frame (sha for tests;
    a real codec would emit the frame bytes or per-frame features)."""
    codec = codec or DeterministicFakeCodec()
    p = partitions or media.sparkSession.sparkContext.defaultParallelism

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                n = min(frames_per_video, int(n_frames or 0)) or frames_per_video
                for i, fr in enumerate(
                    codec.sample_frames(
                        bytes(payload) if payload is not None else b"", n
                    )
                ):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_sha"].append(fr.hex())
            yield pd.DataFrame(out)

    wide = media.select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    ).repartition(p, F.hash("media_id"))
    return wide.mapInPandas(stage, schema=FRAMES_DDL)


def image_ahash(
    media: DataFrame,
    codec: MediaCodec | None = None,
    grid: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Perceptual average-hash (aHash) stage: decode → integer
    grayscale → ``grid×grid`` mean-pool → threshold each cell against
    the global mean → one 64-bit code per image.

    ALL arithmetic is integer (the repo's float-portability
    discipline): grayscale is the channel SUM (not mean), and the
    threshold compare is the cross-multiplication
    ``cell_sum · total_pixels > total_sum · cell_pixels`` so no
    division ever runs — cells of unequal pixel count (side not a
    multiple of ``grid``) still compare exactly. The code is the
    uint64 bit-string viewed as a signed BIGINT (Spark has no
    unsigned type).

    Scale shape: same as the other media stages — wide payload rows
    repartition by ``hash(media_id)`` before one Arrow-batched
    ``mapInPandas`` pass; downstream grouping/banding runs on the
    8-byte code, never the payload. Near-dup at scale: split the code
    into 4×16-bit bands and self-join on any equal band — pigeonhole
    guarantees every pair at Hamming distance ≤ 3 shares a band."""
    codec = codec or DeterministicFakeCodec()
    p = partitions or media.sparkSession.sparkContext.defaultParallelism

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, codes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = codec.decode_image(
                    bytes(payload) if payload is not None else b""
                )
                gray = img.astype(np.int64).sum(axis=2)
                h, w = gray.shape
                total_sum = int(gray.sum())
                total_px = h * w
                ys = np.linspace(0, h, grid + 1, dtype=int)
                xs = np.linspace(0, w, grid + 1, dtype=int)
                code = 0
                for i in range(grid):
                    for j in range(grid):
                        cell = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                        bit = int(
                            int(cell.sum()) * total_px
                            > total_sum * cell.size
                        )
                        code = (code << 1) | bit
                ids.append(mid)
                codes.append(np.uint64(code).astype(np.int64))
            yield pd.DataFrame({"media_id": ids, "ahash": codes})

    wide = media.select("media_id", "payload").repartition(
        p, F.hash("media_id")
    )
    return wide.mapInPandas(stage, schema=AHASH_DDL)


def filter_by_meta(media: DataFrame, mime_prefix: str, min_pixels: int = 0) -> DataFrame:
    """Metadata-only predicate — native, payload column pruned from
    the scan when the caller selects only metadata downstream."""
    return media.where(
        F.col("meta.mime").startswith(mime_prefix)
        & ((F.col("meta.width") * F.col("meta.height")) >= min_pixels)
    )


def synth_media_table(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media rows for tests/benches: payload bytes are
    md5-chained from the id — stable across runs and engines."""
    rows = []
    for i in range(n):
        mid = f"m-{seed}-{i:05d}"
        payload = (hashlib.md5(mid.encode()).digest() * 8)[: 64 + (i % 64)]
        mime = ["image/png", "image/jpeg", "video/mp4", "audio/wav"][i % 4]
        rows.append(
            (mid, payload,
             (mime, 64 + i % 512, 48 + i % 256, (i % 4 == 2) * 4000, (i % 4 == 2) * 12))
        )
    return spark.createDataFrame(rows, MEDIA_DDL)
