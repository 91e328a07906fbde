"""Video frame-sampling and audio window-stats operators
(operators/media.py) — plumbing is real, codecs are stubbed."""

import numpy as np
import pytest

from spatialjoincountovershells_spark.operators.media import (
    audio_window_stats,
    decode_audio_np,
    decode_video_np,
    frame_stats,
    sample_frames,
)
from spatialjoincountovershells_spark.sources.synth import (
    AUDIO_SALT,
    _byte_stream,
    synth_audio,
    synth_videos,
)


def test_decode_video_rawv_layout():
    nf, h, w = 3, 2, 2
    buf = np.arange(nf * h * w * 3, dtype=np.uint8)
    v = decode_video_np(buf.tobytes(), w, h, nf, "rawv")
    assert v.shape == (nf, h, w, 3)
    # frame f is the f-th consecutive w*h*3 slice
    assert np.array_equal(v[1].ravel(), buf[h * w * 3: 2 * h * w * 3])
    with pytest.raises(ValueError):
        decode_video_np(buf.tobytes(), w, h, nf + 1, "rawv")


def test_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_video_np(b"", 8, 8, 1, "mp4")
    with pytest.raises(NotImplementedError):
        decode_audio_np(b"", "mp3")


def test_decode_audio_pcm16_signed():
    s = np.array([0, 1, -1, 32767, -32768], dtype="<i2")
    assert np.array_equal(decode_audio_np(s.tobytes(), "pcm16"), s)


def test_sample_frames_stride_and_bytes(spark):
    vids = synth_videos(spark, 5, seed=99, w=4, h=3, n_frames=7)
    out = sample_frames(vids, stride=3).toPandas()
    # frames 0, 3, 6 per video
    assert sorted(out["frame_idx"].unique()) == [0, 3, 6]
    assert len(out) == 5 * 3
    assert set(out["fmt"]) == {"raw"}
    # exact frame bytes vs a local decode of the deterministic payload
    src = {r["video_id"]: r["bytes"] for r in vids.collect()}
    for _, r in out.iterrows():
        frames = decode_video_np(src[r["video_id"]], 4, 3, 7, "rawv")
        assert bytes(r["frame"]) == frames[r["frame_idx"]].tobytes()


def test_frame_stats_matches_numpy(spark):
    vids = synth_videos(spark, 4, seed=7, w=4, h=4, n_frames=5)
    got = {
        (r["video_id"], r["frame_idx"]): (r["mean_r"], r["mean_g"], r["mean_b"])
        for r in frame_stats(vids, stride=2).collect()
    }
    for r in vids.collect():
        fr = decode_video_np(r["bytes"], 4, 4, 5, "rawv").astype(np.int64)
        for fi in range(0, 5, 2):
            s = fr[fi].reshape(-1, 3).sum(axis=0)
            assert got[(r["video_id"], fi)] == tuple(int(v) * 1000 // 16 for v in s)
    assert len(got) == 4 * 3


def test_audio_window_stats_partial_tail(spark):
    # 10 samples, win=4 -> windows of 4, 4, 2
    aud = synth_audio(spark, 3, seed=5, n_samples=10)
    rows = audio_window_stats(aud, win=4).collect()
    assert len(rows) == 3 * 3
    by = {(r["audio_id"], r["win_idx"]): r for r in rows}
    for r in aud.collect():
        s = decode_audio_np(r["bytes"], "pcm16").astype(np.int64)
        for wi, lo in enumerate(range(0, 10, 4)):
            seg = s[lo:lo + 4]
            g = by[(r["audio_id"], wi)]
            assert (g["n"], g["vmin"], g["vmax"], g["sum_abs"]) == (
                len(seg), int(seg.min()), int(seg.max()), int(np.abs(seg).sum()))


def test_sampled_frames_compose_with_image_operators(spark):
    """A sampled frame IS an images-table row (fmt='raw') — the media
    fan-out feeds images.image_features / tiling downstream unchanged."""
    from spatialjoincountovershells_spark.operators.images import image_features

    vids = synth_videos(spark, 6, seed=31, w=8, h=8, n_frames=4)
    frames = sample_frames(vids, stride=2).selectExpr(
        "concat(video_id, '#', frame_idx) AS image_id",
        "frame AS bytes", "w", "h", "fmt")
    feats = {r["image_id"]: r for r in image_features(frames).collect()}
    assert len(feats) == 6 * 2
    # channel means agree with frame_stats' (same integer quantization)
    for r in frame_stats(vids, stride=2).collect():
        f = feats[f"{r['video_id']}#{r['frame_idx']}"]
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (
            r["mean_r"], r["mean_g"], r["mean_b"])


def test_synth_media_partition_independent(spark):
    a = set(map(tuple, synth_videos(spark, 16, seed=3, partitions=1)
                .select("video_id", "bytes").collect()))
    b = set(map(tuple, synth_videos(spark, 16, seed=3, partitions=7)
                .select("video_id", "bytes").collect()))
    assert a == b
    c = set(map(tuple, synth_audio(spark, 16, seed=3, partitions=1).collect()))
    d = set(map(tuple, synth_audio(spark, 16, seed=3, partitions=5).collect()))
    assert c == d
    # audio stream is decorrelated from the image payload stream
    assert _byte_stream(3, 0, 16, AUDIO_SALT) != _byte_stream(3, 0, 16)
