"""Property tests for the codec-free media decode kernels: any valid
container round-trips to the reference statistics computed directly from
the payload — independent of the md5-derived fixtures the oracle-checked
queries use. Pure Python (no Spark), so the whole file runs in seconds."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from construction_data_lake_et_data_warehouse_tp3_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    decode_y4m,
)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.data(),
)
def test_ppm_roundtrip_any_dims(w, h, data):
    pixels = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
    )
    content = f"P6\n{w} {h}\n255\n".encode() + bytes(pixels)
    dw, dh, r, g, b = decode_ppm(content)
    assert (dw, dh) == (w, h)
    for channel, got in ((0, r), (1, g), (2, b)):
        assert got == sum(pixels[channel::3]) / (w * h)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
def test_wav_roundtrip_any_samples(samples):
    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    n, rate, peak, mean, crossings = decode_wav(wav)
    assert (n, rate) == (len(samples), 8000)
    assert peak == max(abs(s) for s in samples)
    assert mean == sum(abs(s) for s in samples) / len(samples)
    neg = [s < 0 for s in samples]
    assert crossings == sum(1 for a, b in zip(neg, neg[1:]) if a != b)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 4).map(lambda x: 2 * x),  # even dims for C420
    st.integers(1, 4).map(lambda x: 2 * x),
    st.integers(1, 3),
    st.data(),
)
def test_y4m_roundtrip_any_geometry(w, h, n_frames, data):
    y_size = w * h
    frame_size = y_size + 2 * (y_size // 4)
    frames = [
        data.draw(
            st.lists(st.integers(0, 255), min_size=frame_size, max_size=frame_size)
        )
        for _ in range(n_frames)
    ]
    clip = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode() + b"".join(
        b"FRAME\n" + bytes(f) for f in frames
    )
    dw, dh, dn, mean, rng = decode_y4m(clip)
    assert (dw, dh, dn) == (w, h, n_frames)
    lumas = [sum(f[:y_size]) / y_size for f in frames]
    assert mean == sum(lumas) / n_frames
    assert rng == max(lumas) - min(lumas)
