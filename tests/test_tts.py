"""TTS pipeline pieces: ISTFT reconstruction (embd_to_audio), WAV writer,
prompt text processing — reference examples/tts/tts.cpp."""

import struct

import numpy as np

from llama_cpp_dsp_tpu.tools.tts import (
    N_FFT, N_HOP, embd_to_audio, process_text, save_wav16,
)


def test_embd_to_audio_reconstructs_sine():
    """A pure tone analyzed with the same STFT must reconstruct to itself
    (up to window-edge effects) — validates mag/phase layout, irfft and the
    overlap-add normalization."""
    sr, f = 24000, 937.5  # exact bin: 937.5 = 50 * 24000/1280
    n_codes = 20
    n = (n_codes - 1) * N_HOP + N_FFT
    t = np.arange(n) / sr
    # amplitude 0.2 keeps the spectral peak under embd_to_audio's 1e2
    # magnitude clip (hann-windowed bin peak ≈ 0.2 · N_FFT/4 = 64)
    x = 0.2 * np.sin(2 * np.pi * f * t).astype(np.float64)

    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    frames = []
    pad = (N_FFT - N_HOP) // 2
    xp = np.pad(x, (pad, pad))
    for l in range(n_codes):  # noqa: E741
        seg = xp[l * N_HOP : l * N_HOP + N_FFT]
        spec = np.fft.rfft(seg * hann)
        frames.append(spec)
    spec = np.stack(frames)  # [n_codes, 641]
    mag = np.log(np.maximum(np.abs(spec), 1e-9))
    phi = np.angle(spec)
    embd = np.concatenate([mag, phi], axis=1).astype(np.float32)

    audio = embd_to_audio(embd)
    assert audio.shape[0] == n - 2 * pad
    # the fold's n_pad trim exactly cancels the analysis pre-pad: output
    # sample i corresponds to x[i]
    core = slice(N_FFT, audio.shape[0] - N_FFT)
    err = np.sqrt(np.mean((audio[core] - x[: audio.shape[0]][core]) ** 2))
    assert err < 1e-6, err


def test_save_wav16(tmp_path):
    path = tmp_path / "t.wav"
    audio = np.sin(np.linspace(0, 40, 2400)).astype(np.float32) * 0.5
    save_wav16(str(path), audio)
    raw = path.read_bytes()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    rate = struct.unpack("<I", raw[24:28])[0]
    assert rate == 24000
    assert len(raw) == 44 + 2 * len(audio)


def test_process_text():
    assert process_text("Hello, World!") == "hello<|text_sep|>world"
    assert process_text("a-b_c") == "a<|text_sep|>b<|text_sep|>c"
