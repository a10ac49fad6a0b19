"""AM/SSB demod loopback: synthesized tones recovered in the WAV output."""

import wave

import numpy as np

import satdump_tpu.pipeline.modules  # noqa: F401 (registers modules)
from satdump_tpu.io.baseband import write_baseband
from satdump_tpu.pipeline.module import module_registry


def _run(mod_id, iq, fs, audio_rate, tmp_path, extra=None):
    bb = tmp_path / "in.cf32"
    write_baseband(str(bb), "cf32", iq.astype(np.complex64))
    params = {"samplerate": fs, "symbolrate": audio_rate,
              "buffer_size": 1 << 14}
    params.update(extra or {})
    m = module_registry.get(mod_id)(str(bb), str(tmp_path / "out"), params)
    m.process()
    with wave.open(m.d_output_file, "rb") as wf:
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), np.int16)
    return pcm.astype(np.float64) / 32767.0


def _tone_freq(audio, rate):
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    return np.fft.rfftfreq(len(audio), 1 / rate)[np.argmax(spec[1:]) + 1]


def test_am_demod_tone(tmp_path):
    fs, audio_rate, tone = 96000, 48000, 2000.0
    t = np.arange(1 << 16) / fs
    env = 1.0 + 0.6 * np.cos(2 * np.pi * tone * t)
    iq = env * np.exp(2j * np.pi * 300.0 * t)  # small carrier offset
    audio = _run("am_demod", iq, fs, audio_rate, tmp_path)
    assert len(audio) > 1 << 14
    f = _tone_freq(audio[2000:], audio_rate)
    assert abs(f - tone) < 30.0


def test_ssb_usb_tone(tmp_path):
    fs, audio_rate = 96000, 48000
    # USB signal: a tone at +13 kHz baseband = audio 13k - 12k = 1 kHz
    t = np.arange(1 << 16) / fs
    iq = np.exp(2j * np.pi * 13000.0 * t)
    audio = _run("ssb_demod", iq, fs, audio_rate, tmp_path,
                 {"sideband": "usb"})
    f = _tone_freq(audio[2000:], audio_rate)
    assert abs(f - 1000.0) < 30.0
