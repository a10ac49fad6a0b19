"""SSTV loopback: synthesize mode-conformant FM audio, decode, compare."""

import wave

import numpy as np

from satdump_tpu.pipeline.modules.analog import (FREQ_BLACK, FREQ_SYNC,
                                                 FREQ_WHITE, SSTV_MODES,
                                                 SSTVDecoderModule,
                                                 decode_sstv)

SR = 48000.0


def _fm_synth(freqs: np.ndarray) -> np.ndarray:
    phase = np.cumsum(2 * np.pi * freqs / SR)
    return np.sin(phase).astype(np.float32)


def _lum_freq(v):
    return FREQ_BLACK + v * (FREQ_WHITE - FREQ_BLACK)


def _line_freqs(cfg, segments):
    """One line of per-sample frequencies from (offset, time, values)
    segments; sync pulse at the line start; black elsewhere."""
    n = int(round(cfg["line_time"] * SR))
    f = np.full(n, FREQ_BLACK)
    f[: int(cfg["sync_time"] * SR)] = FREQ_SYNC
    for off, dur, vals in segments:
        i0 = int(round(off * SR))
        i1 = int(round((off + dur) * SR))
        pos = np.linspace(0, 1, i1 - i0, endpoint=False)
        src = np.clip((pos * len(vals)).astype(int), 0, len(vals) - 1)
        f[i0:i1] = _lum_freq(np.asarray(vals, np.float64)[src])
    return f


def test_bw8_grayscale_roundtrip():
    cfg = SSTV_MODES["BW8"]
    w = cfg["img_width"]
    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 0.9, size=(24, 8))  # blocky for bilinear slack
    img = np.repeat(img, w // 8, axis=1)[:, :w]
    freqs = np.concatenate(
        [_line_freqs(cfg, [(cfg["img_offset"], cfg["img_time"], img[i])])
         for i in range(img.shape[0])])
    audio = _fm_synth(freqs)
    out = decode_sstv(audio, SR, "BW8")
    assert out.shape[0] >= 22 and out.shape[1] == w
    # compare interior (skip transition pixels at block edges)
    got = out[:22].astype(float) / 255.0
    exp = img[:22]
    err = np.abs(got - exp)
    assert np.median(err) < 0.05
    assert err.mean() < 0.1


def test_robot36_color_roundtrip():
    cfg = SSTV_MODES["Robot36"]
    w = cfg["img_width"]
    # flat-color frame: YUV (180, 100, 160) everywhere
    y0, u0, v0 = 180 / 255.0, 100 / 255.0, 160 / 255.0
    lines = []
    for i in range(12):
        if i % 2 == 0:  # carries Y + V, separator LOW (black-ish)
            segs = [(cfg["color_offset_y"], cfg["color_time_y"], [y0] * 8),
                    (cfg["color_sync_offset"], cfg["color_sync_time"], [0.0]),
                    (cfg["color_offset_uv"], cfg["color_time_uv"], [v0] * 8)]
        else:           # carries Y + U, separator HIGH (white)
            segs = [(cfg["color_offset_y"], cfg["color_time_y"], [y0] * 8),
                    (cfg["color_sync_offset"], cfg["color_sync_time"], [1.0]),
                    (cfg["color_offset_uv"], cfg["color_time_uv"], [u0] * 8)]
        lines.append(_line_freqs(cfg, segs))
    audio = _fm_synth(np.concatenate(lines))
    out = decode_sstv(audio, SR, "Robot36")
    assert out.ndim == 3 and out.shape[1] == w and out.shape[0] >= 8
    # expected RGB from the BT.601 matrix
    from satdump_tpu.pipeline.modules.analog import yuv_to_rgb
    exp = yuv_to_rgb(np.array([[180]]), np.array([[100]]),
                     np.array([[160]]))[0, 0]
    mid = out[2:-2, w // 4: 3 * w // 4]
    err = np.abs(mid.astype(float) - exp.astype(float))
    assert np.median(err) < 12


def test_sstv_module_wav(tmp_path):
    cfg = SSTV_MODES["BW8"]
    img = np.tile(np.linspace(0.1, 0.9, 8), (10, 1))
    img = np.repeat(img, cfg["img_width"] // 8, axis=1)[:, :cfg["img_width"]]
    freqs = np.concatenate(
        [_line_freqs(cfg, [(cfg["img_offset"], cfg["img_time"], img[i])])
         for i in range(img.shape[0])])
    audio = _fm_synth(freqs)
    wav_path = tmp_path / "sstv.wav"
    with wave.open(str(wav_path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(SR))
        wf.writeframes((audio * 32000).astype(np.int16).tobytes())
    m = SSTVDecoderModule(str(wav_path), str(tmp_path / "out"),
                          {"sstv_mode": "BW8"})
    m.process()
    assert m.d_output_file.endswith(".png")
    from satdump_tpu.image.io import load_img
    got = load_img(m.d_output_file)
    assert got.shape[1] == cfg["img_width"]
    assert m.stats["lines"] >= 9
