"""Deterministic synthetic images/halos tables (FIXTURES.md §1-2).

The analog of the reference's MT19937 uniform generators
(``src/uniform_decoded_particle_generator/main.c``,
``src/uniform_halo_generator/main.c``) with one crucial change for
distributed determinism: positions derive from splitmix64 of the row
id (partition-independent), never from ``F.rand`` (SURVEY §2.1 S8).

The position is quantized to uint16 per axis and packed into
``phash:int64`` — the images table IS the particle table; the decode
path is functions/phash.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Standard public-domain splitmix64 mixer, vectorized on uint64."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
        return z ^ (z >> np.uint64(31))


def _u16(seed: int, ids: np.ndarray, stream: int) -> np.ndarray:
    """uint16 uniform per (seed, row, stream) — stable across partitioning."""
    h = splitmix64(
        ids.astype(np.uint64)
        ^ splitmix64(np.uint64(seed) + np.uint64(stream) * np.uint64(0x9E37))
    )
    return (h >> np.uint64(48)).astype(np.uint64)  # top 16 bits


def _phash(seed: int, ids: np.ndarray) -> np.ndarray:
    qx, qy, qz = (_u16(seed, ids, s) for s in (1, 2, 3))
    return ((qx << np.uint64(32)) | (qy << np.uint64(16)) | qz).astype(np.int64)


def _byte_stream(seed: int, i: int, nbytes: int, salt: int = 0xB10C) -> bytes:
    """Deterministic byte stream: splitmix64 words viewed little-endian.

    The SQL twin is __spark_entry__._byte_cte — byte j of word v is
    (v // 256^j) % 256, which is exactly the u64 little-endian layout."""
    words = splitmix64(
        np.arange((nbytes + 7) // 8, dtype=np.uint64)
        + splitmix64(np.uint64(seed) ^ np.uint64(i) ^ np.uint64(salt))
    )
    return words.view(np.uint8)[:nbytes].tobytes()


def _payload(seed: int, i: int, w: int, h: int) -> bytes:
    """Deterministic raw RGB8 payload: w*h*3 bytes from splitmix64."""
    return _byte_stream(seed, i, w * h * 3)


def synth_images(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    with_payload: bool = True,
    w: int = 8,
    h: int = 8,
    id_prefix: str = "img",
    partitions: int | None = None,
) -> DataFrame:
    """Images table per FIXTURES.md §1; positions packed in phash."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            out = pd.DataFrame(
                {
                    "image_id": [f"{id_prefix}{i:012d}" for i in ids],
                    "bytes": [
                        _payload(seed, int(i), w, h) if with_payload else b""
                        for i in ids
                    ],
                    "w": np.int32(w),
                    "h": np.int32(h),
                    "fmt": "raw",
                    "caption": [
                        f"synthetic caption {i} {splitmix64(np.uint64(seed) ^ np.uint64(i)):x}"
                        for i in ids
                    ],
                    "phash": _phash(seed, ids),
                }
            )
            yield out

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=IMAGES_SCHEMA)


VIDEOS_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
)

AUDIO_SALT = 0xA0D10

AUDIO_SCHEMA = "audio_id string, bytes binary, sr int, n_samples int, fmt string"


def synth_videos(
    spark: SparkSession,
    n: int,
    seed: int = 21,
    w: int = 8,
    h: int = 8,
    n_frames: int = 6,
    id_prefix: str = "vid",
    partitions: int | None = None,
) -> DataFrame:
    """Videos table: n_frames concatenated raw RGB8 frames per row
    (fmt='rawv') — deterministic per (seed, row id), partition-independent.
    The byte stream is _payload with height h*n_frames, so the image
    oracle CTE reproduces it verbatim."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "video_id": [f"{id_prefix}{i:012d}" for i in ids],
                    "bytes": [
                        _payload(seed, int(i), w, h * n_frames) for i in ids
                    ],
                    "w": np.int32(w),
                    "h": np.int32(h),
                    "n_frames": np.int32(n_frames),
                    "fmt": "rawv",
                }
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=VIDEOS_SCHEMA)


def synth_audio(
    spark: SparkSession,
    n: int,
    seed: int = 23,
    n_samples: int = 512,
    sr: int = 16000,
    id_prefix: str = "aud",
    partitions: int | None = None,
) -> DataFrame:
    """Audio table: bare s16le PCM (fmt='pcm16'), deterministic per
    (seed, row id) via the salted byte stream (AUDIO_SALT decorrelates
    it from the image payload stream)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "audio_id": [f"{id_prefix}{i:012d}" for i in ids],
                    "bytes": [
                        _byte_stream(seed, int(i), 2 * n_samples, AUDIO_SALT)
                        for i in ids
                    ],
                    "sr": np.int32(sr),
                    "n_samples": np.int32(n_samples),
                    "fmt": "pcm16",
                }
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=AUDIO_SCHEMA)


def synth_points(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    id_col: str = "halo_id",
    partitions: int | None = None,
) -> DataFrame:
    """Bare (id, phash) point table — halos or particles without payload.

    Positions are identical to synth_images(seed) rows: halos as a
    standalone table of the same shape (FIXTURES.md §2).
    """

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            yield pd.DataFrame({id_col: ids, "phash": _phash(seed, ids)})

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=f"{id_col} long, phash long")


def _caption_word_key(seed: int, j: int) -> int:
    """Compile-time xor constant for caption word stream j — a plain
    int both the numpy generator and the DuckDB oracle inline as a
    literal (so the SQL twin needs only ONE sm64 chain per word)."""
    return int(splitmix64(np.uint64(seed * 8 + j)))


def _caption_words(seed: int, ids: np.ndarray, j: int) -> np.ndarray:
    """uint64 word stream j per row: splitmix64(id ^ key(seed, j))."""
    return splitmix64(
        ids.astype(np.uint64) ^ np.uint64(_caption_word_key(seed, j))
    )


def synth_captioned_points(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    id_col: str = "image_id",
    partitions: int | None = None,
) -> DataFrame:
    """(image_id, phash, phash_alt, caption, caption_alt) — the
    cross-modal dedup fixture table (operators/images.py
    crossmodal_dup_pairs).

    ``caption`` is three decimal splitmix64 words ('cap w0 w1 w2'):
    long enough to shingle, and pairwise DISSIMILAR across ids so
    minhash bands only fire on planted duplicates; ``caption_alt``
    ('alt w3 w4 w5') is an unrelated second text per id for planting
    image-dup-with-different-caption rows.  ``phash_alt`` is the
    seed+1 phash — an independent 48-bit value for planting
    caption-dup-with-unrelated-image rows.  Everything is a pure
    function of (seed, id): partition-independent, and mirrored
    verbatim by the __spark_entry__ oracle CTEs.
    """

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            ws = [_caption_words(seed, ids, j) for j in range(6)]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "phash": _phash(seed, ids),
                    "phash_alt": _phash(seed + 1, ids),
                    "caption": [
                        f"cap {a} {b} {c}" for a, b, c in zip(ws[0], ws[1], ws[2])
                    ],
                    "caption_alt": [
                        f"alt {a} {b} {c}" for a, b, c in zip(ws[3], ws[4], ws[5])
                    ],
                }
            )

    rng = spark.range(n, numPartitions=partitions)
    return rng.mapInPandas(
        gen,
        schema=(
            f"{id_col} long, phash long, phash_alt long, "
            "caption string, caption_alt string"
        ),
    )


def synth_points_np(n: int, seed: int) -> np.ndarray:
    """(n,3) float32 positions — numpy oracle mirror of synth_points."""
    from ..functions.phash import decode_phash_np

    ids = np.arange(n, dtype=np.int64)
    return decode_phash_np(_phash(seed, ids))
