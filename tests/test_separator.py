"""Vocal-separator adapter: STFT/chunk/overlap/iSTFT plumbing verified with
an identity "model" — the output must reconstruct the input waveform."""
import numpy as np
import pytest

from mmgt_tpu.data.separator import MDXVocalSeparator, _istft, _stft


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 8000)).astype(np.float32)
    spec = _stft(wav, 1024, 256)
    back = _istft(spec, 1024, 256, 8000)
    np.testing.assert_allclose(back, wav, atol=1e-6)


def test_separator_identity_model_reconstructs():
    """With a spectrogram-identity net, the separated vocals equal the
    input (up to the truncated >dim_f frequency band + compensation)."""

    class IdentityRunner:
        def __call__(self, x):
            # (1, 4, dim_f, T) -> same spec back
            return {"out": x}

    sep = MDXVocalSeparator(
        onnx_path=None, n_fft=512, hop=128, dim_f=257, dim_t=6,
        compensation=1.0, runner=IdentityRunner(),
    )
    rng = np.random.default_rng(1)
    # band-limited signal so the dim_f truncation is lossless
    t = np.arange(30000) / 16000.0
    wav = (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1000 * t)
    ).astype(np.float32)
    out = sep(wav)
    assert out.shape == wav.shape
    err = np.abs(out - wav)[256:-256].max()  # edges trimmed by design
    assert err < 1e-3, err


def test_separator_wired_into_audio_processor():
    from mmgt_tpu.data.audio import AudioProcessor

    assert "vocal_separator" in AudioProcessor.__init__.__code__.co_varnames
