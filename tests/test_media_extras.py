"""Frame sampling and WAV audio metadata/features."""

import numpy as np
import pytest

from docvault_ocr_service_spark.extract.audio import (
    AudioDecodeError, encode_wav, parse_wav)
from docvault_ocr_service_spark.extract.images import (
    decode_png, encode_gif_gray, encode_png, encode_tiff_gray)


def test_parse_wav_roundtrip():
    t = np.arange(8000) / 8000.0
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)          # 1s of A440
    meta = parse_wav(encode_wav(wave, 8000))
    assert meta["channels"] == 1 and meta["sample_rate"] == 8000
    assert meta["bits"] == 16 and meta["n_samples"] == 8000
    assert meta["duration_ms"] == 1000
    # mean |sin| = 2/pi * amplitude; rms = amplitude/sqrt(2)
    assert abs(meta["mean_amplitude"] - 0.5 * 2 / np.pi) < 0.01
    assert abs(meta["rms_amplitude"] - 0.5 / np.sqrt(2)) < 0.01
    with pytest.raises(AudioDecodeError):
        parse_wav(b"RIFFxxxxWAVEbroken")
    with pytest.raises(AudioDecodeError):
        parse_wav(b"not audio at all")


def test_audio_media_features(spark):
    from docvault_ocr_service_spark.functions.multimodal import (
        extract_media_features)

    wave = encode_wav(0.25 * np.ones(4000), 8000)     # 0.5s DC
    rows = [("w", "audio", wave),
            ("m", "audio", b"ID3\x03rest of an mp3"),
            ("u", "audio", b"random bytes")]
    media = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
    got = {r["media_id"]: r for r in
           extract_media_features(media, fake=False).collect()}
    w = got["w"]
    assert w["decode_status"] == "ok" and w["format"] == "wav"
    assert w["n_frames"] == 4000
    assert abs(w["brightness"] - 0.25) < 0.01         # mean |amplitude|
    assert w["features"][0] == 500.0                  # duration_ms
    assert got["m"]["decode_status"] == "no_codec:mp3"
    assert got["u"]["decode_status"] == "unknown_format"


def test_sample_frames(spark):
    from docvault_ocr_service_spark.functions.multimodal import (
        sample_frames)

    frames = [np.full((8, 8), v, dtype=np.uint8)
              for v in (10, 60, 110, 160, 210, 250)]
    rows = [("gif6", encode_gif_gray(frames)),
            ("tif2", encode_tiff_gray(frames[:2])),
            ("png1", encode_png(frames[0])),
            ("bad", b"\x89PNG\r\n\x1a\nbroken")]
    media = spark.createDataFrame(rows, ["media_id", "payload"])
    out = sample_frames(media, max_frames=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    gif = sorted(by_id["gif6"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in gif] == [0, 2, 4]  # evenly spaced
    assert [round(r["brightness"]) for r in gif] == [10, 110, 210]
    assert all(r["n_frames"] == 6 and r["status"] == "ok" for r in gif)
    # sampled frames round-trip as PNGs
    assert (decode_png(bytes(gif[1]["frame_png"]))[..., 0] == 110).all()
    assert [r["frame_idx"] for r in by_id["tif2"]] == [0, 1]
    assert len(by_id["png1"]) == 1 and by_id["png1"][0]["n_frames"] == 1
    assert by_id["bad"][0]["status"].startswith("undecodable")
