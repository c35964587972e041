"""Text-to-speech pipeline (reference examples/tts/tts.cpp, OuteTTS flow):
LM generates audio codebook tokens → WavTokenizer decoder produces
spectrogram features → inverse-STFT overlap-add reconstructs the waveform.

Usage: python -m llama_cpp_dsp_tpu.tools.tts -m outetts.gguf -mv wavtok.gguf
           -p "hello world" -o out.wav
"""

from __future__ import annotations

import argparse
import re
import struct
import sys

import numpy as np

N_FFT = 1280
N_HOP = 320
SAMPLE_RATE = 24000
# OuteTTS audio-code token range (tts.cpp:999-1009)
CODE_TOKEN_MIN = 151672
CODE_TOKEN_MAX = 155772


def embd_to_audio(embd: np.ndarray) -> np.ndarray:
    """[n_codes, n_embd] vocoder features → waveform (tts.cpp embd_to_audio):
    first half of each frame = log-magnitudes (exp, clipped at 1e2), second
    half = phases; per-frame irfft(1280), hann-windowed overlap-add at hop
    320, normalized by the folded squared window."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    n_win = N_FFT
    n_pad = (n_win - N_HOP) // 2
    n_out = (n_codes - 1) * N_HOP + n_win

    mag = np.minimum(np.exp(embd[:, :half].astype(np.float64)), 1e2)
    phi = embd[:, half:].astype(np.float64)
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # [n_codes, n_fft/2+1]
    frames = np.fft.irfft(spec, n=N_FFT, axis=1)  # [n_codes, n_fft]

    # periodic hann (tts.cpp fill_hann_window(periodic=true))
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    res = frames * hann[None, :]
    env_frame = hann * hann

    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):  # noqa: E741
        start = l * N_HOP - n_pad
        lo = max(start, 0)
        hi = min(start + n_win, n_out)
        audio[lo:hi] += res[l, lo - start : hi - start]
        env[lo:hi] += env_frame[lo - start : hi - start]
    audio = audio[: n_out - 2 * n_pad]
    env = env[: n_out - 2 * n_pad]
    return (audio / np.maximum(env, 1e-8)).astype(np.float32)


def save_wav16(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    """Mono 16-bit PCM WAV (tts.cpp save_wav16)."""
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def process_text(text: str) -> str:
    """OuteTTS v0.2 prompt text normalization (tts.cpp process_text)."""
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.replace(" ", "<|text_sep|>")


def synthesize_codes(model, text: str, *, n_predict: int = 4096,
                     temp: float = 0.4, top_k: int = 40) -> list[int]:
    """Drive the OuteTTS LM to produce audio codebook tokens."""
    from ..runtime.context import LlamaContext
    from ..runtime.sampling import make_chain

    ctx = LlamaContext(model, n_ctx=8192)
    prompt = ("<|im_start|>\n<|text_start|>" + process_text(text)
              + "<|text_end|>\n<|audio_start|>\n")
    ids = model.tokenizer.encode(prompt, add_special=False, parse_special=True)
    sampler = make_chain(temp=temp, top_k=top_k)
    out = []
    audio_end = model.vocab.token_id("<|audio_end|>")
    for tok in ctx.generate(ids, max_new_tokens=n_predict, sampler=sampler):
        if audio_end is not None and tok == audio_end:
            break
        out.append(tok)
    return [t - CODE_TOKEN_MIN for t in out
            if CODE_TOKEN_MIN <= t <= CODE_TOKEN_MAX]


def main(argv=None):
    from ..runtime.loader import load_model
    from ..models.wavtokenizer import forward as wavtok_forward, load_wavtokenizer
    from ..utils.jax_setup import setup_jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True, help="OuteTTS LM gguf")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer-dec gguf")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("-n", "--n-predict", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.4)
    args = ap.parse_args(argv)
    setup_jax()

    import jax.numpy as jnp

    model = load_model(args.model)
    codes = synthesize_codes(model, args.prompt, n_predict=args.n_predict,
                             temp=args.temp)
    if not codes:
        print("no audio tokens generated", file=sys.stderr)
        return 1
    vcfg, vparams = load_wavtokenizer(args.model_vocoder)
    embd = np.asarray(wavtok_forward(
        vparams, vcfg, jnp.asarray(np.asarray(codes, np.int32)[None])))[0]
    audio = embd_to_audio(embd)
    save_wav16(args.output, audio)
    print(f"wrote {args.output}: {len(audio)/SAMPLE_RATE:.2f}s "
          f"({len(codes)} codes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
