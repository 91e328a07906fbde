"""Opaque-binary multimodal columns: video frame sampling and audio
window features (graft scope — the training-data-pipeline surface
beyond the reference's own operators, like `operators/images.py`).

Media payloads travel as `binary` columns with typed metadata
(w/h/n_frames for video, sr/n_samples for audio); the operators are
Arrow-batched ``mapInPandas`` with numpy per row (codec granularity,
same shape as `tiling.image_tile_stats`).  The container formats this
environment can actually decode are the raw ones:

* ``rawv`` — n_frames consecutive bare RGB8 frames (w*h*3 bytes each);
* ``pcm16`` — bare little-endian signed 16-bit PCM.

Real codec formats (mp4/webm/mp3/...) raise ``NotImplementedError``
from the decode helpers — the libs aren't in this container; the
Spark-side plumbing (schema, batch iteration, partitioning) is real
and tested, and a codec drops into ``decode_video_np`` /
``decode_audio_np`` without touching the operators.

All reductions are integer-exact (floor-scaled means, int64 sums), so
the driver's DuckDB oracle gate can hash-check them bit-for-bit
(`__spark_entry__._video_frames_sql` / `_audio_stats_sql`).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def decode_video_np(data: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """-> (n_frames, h, w, 3) uint8.  'rawv' is bare concatenated RGB8
    frames; compressed containers need codecs not present here."""
    if fmt == "rawv":
        a = np.frombuffer(data, dtype=np.uint8)
        if a.size != n_frames * w * h * 3:
            raise ValueError(
                f"rawv payload size {a.size} != {n_frames}x{h}x{w}x3")
        return a.reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"fmt={fmt!r} needs a video codec (pyav/ffmpeg) not present here")


def decode_audio_np(data: bytes, fmt: str) -> np.ndarray:
    """-> (n_samples,) int16.  'pcm16' is bare s16le; compressed audio
    needs codecs not present here."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"fmt={fmt!r} needs an audio codec not present here")


FRAMES_SCHEMA = (
    "video_id string, frame_idx int, frame binary, w int, h int, fmt string"
)


def sample_frames(
    videos: DataFrame,
    stride: int = 2,
    id_col: str = "video_id",
) -> DataFrame:
    """Frame-sample: one output row per kept frame (0, stride, 2*stride...).

    The 100 TB shape: videos only ever fan OUT (no shuffle, no state) —
    partition-local mapInPandas, each output frame a standalone raw
    image row that composes with the image operators downstream
    (`images.image_features`, `tiling.image_tile_stats`)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "video_id", "frame_idx", "frame", "w", "h", "fmt")}
            for _, r in pdf.iterrows():
                fr = decode_video_np(
                    r["bytes"], int(r["w"]), int(r["h"]),
                    int(r["n_frames"]), r["fmt"])
                for fi in range(0, fr.shape[0], stride):
                    rows["video_id"].append(r[id_col])
                    rows["frame_idx"].append(fi)
                    rows["frame"].append(fr[fi].tobytes())
                    rows["w"].append(int(r["w"]))
                    rows["h"].append(int(r["h"]))
                    rows["fmt"].append("raw")
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["w"] = out["w"].astype("int32")
            out["h"] = out["h"].astype("int32")
            yield out

    return videos.mapInPandas(gen, schema=FRAMES_SCHEMA)


def frame_stats(videos: DataFrame, stride: int = 2) -> DataFrame:
    """-> (video_id, frame_idx, mean_r, mean_g, mean_b): frame-sample +
    integer per-frame channel means (floor(sum*1000/npx), the same
    quantization as images.image_features — exact in the oracle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "video_id", "frame_idx", "mean_r", "mean_g", "mean_b")}
            for _, r in pdf.iterrows():
                w, h = int(r["w"]), int(r["h"])
                fr = decode_video_np(
                    r["bytes"], w, h, int(r["n_frames"]), r["fmt"])
                npx = w * h
                for fi in range(0, fr.shape[0], stride):
                    px = fr[fi].reshape(npx, 3).astype(np.int64)
                    s = px.sum(axis=0)
                    rows["video_id"].append(r["video_id"])
                    rows["frame_idx"].append(fi)
                    rows["mean_r"].append(int(s[0]) * 1000 // npx)
                    rows["mean_g"].append(int(s[1]) * 1000 // npx)
                    rows["mean_b"].append(int(s[2]) * 1000 // npx)
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return videos.mapInPandas(
        gen,
        schema=("video_id string, frame_idx int, "
                "mean_r long, mean_g long, mean_b long"),
    )


def audio_window_stats(
    audio: DataFrame,
    win: int = 128,
    id_col: str = "audio_id",
) -> DataFrame:
    """-> (audio_id, win_idx, n, vmin, vmax, sum_abs) per sample window.

    Integer stats over s16le PCM windows (last window may be partial) —
    the audio analog of image_features, all-int64 so the DuckDB oracle
    reproduces it exactly.  Partition-local fan-out, no shuffle."""
    if win < 1:
        raise ValueError("win must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "audio_id", "win_idx", "n", "vmin", "vmax", "sum_abs")}
            for _, r in pdf.iterrows():
                s = decode_audio_np(r["bytes"], r["fmt"]).astype(np.int64)
                for wi in range(0, (len(s) + win - 1) // win):
                    seg = s[wi * win:(wi + 1) * win]
                    rows["audio_id"].append(r[id_col])
                    rows["win_idx"].append(wi)
                    rows["n"].append(len(seg))
                    rows["vmin"].append(int(seg.min()))
                    rows["vmax"].append(int(seg.max()))
                    rows["sum_abs"].append(int(np.abs(seg).sum()))
            out = pd.DataFrame(rows)
            out["win_idx"] = out["win_idx"].astype("int32")
            yield out

    return audio.mapInPandas(
        gen,
        schema=("audio_id string, win_idx int, n long, "
                "vmin long, vmax long, sum_abs long"),
    )
