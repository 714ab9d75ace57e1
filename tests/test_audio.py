import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmgt_tpu.data import dsp
from mmgt_tpu.data.audio import (
    interpolate_align_corners,
    pad_to_clip_multiple,
    slice_audio,
    stack_audio_window,
    wav2vec_normalize,
)
from mmgt_tpu.models.wav2vec2 import Wav2Vec2Model, linear_interpolate_seq
from mmgt_tpu.models.wavlm import WavLMModel, relative_position_buckets


def _tone(seconds=1.0, sr=dsp.SR, freq=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# --------------------------------------------------------------------- dsp
def test_stft_and_mel_shapes():
    y = _tone(0.5)
    s = dsp.stft(y)
    assert s.shape[0] == 1025
    m = dsp.melspectrogram(y)
    assert m.shape[0] == 128
    # 440 Hz tone: energy concentrated near bin 440/ (sr/2) * 1024
    mag = np.abs(s).mean(axis=1)
    peak_bin = np.argmax(mag)
    expected = round(440 / (dsp.SR / 2) * 1024)
    assert abs(peak_bin - expected) <= 2


def test_mfcc_chroma_shapes():
    y = _tone(0.5)
    m = dsp.mfcc(y)
    assert m.shape[1] == 20
    c = dsp.chroma(y)
    assert c.shape[1] == 12
    # chroma of an A440 tone peaks at pitch class A (index 9)
    assert np.argmax(c.mean(axis=0)) == 9


def test_onset_strength_responds_to_impulses():
    sr = dsp.SR
    y = np.zeros(sr, np.float32)
    for k in range(4):
        start = int(k * 0.25 * sr)
        y[start : start + 400] = np.random.default_rng(k).standard_normal(400) * 0.5
    env = dsp.onset_strength(y)
    peaks = dsp.peak_pick(env)
    assert len(peaks) >= 3
    # peaks near the impulse frames (hop 512 @ 12800 -> 25 fps)
    impulse_frames = [int(k * 0.25 * sr / dsp.HOP) for k in range(4)]
    for f in impulse_frames[1:]:
        assert min(abs(p - f) for p in peaks) <= 2


def test_beat_track_periodic_clicks():
    sr = dsp.SR
    y = np.zeros(2 * sr, np.float32)
    period_s = 0.5  # 120 bpm
    for k in range(4):
        start = int(k * period_s * sr)
        y[start : start + 300] = 0.8
    env = dsp.onset_strength(y)
    tempo, beats = dsp.beat_track(env, start_bpm=120.0)
    assert 60 <= tempo <= 260
    assert len(beats) >= 2


def test_baseline_features_shape():
    y = _tone(3.2)
    f = dsp.baseline_features(y)
    assert f.shape == (80, 35)
    assert np.isfinite(f).all()


# ------------------------------------------------------------------- audio
def test_slice_audio():
    wav = np.ones(int(7.0 * 16000), np.float32)
    slices = slice_audio(wav)
    assert len(slices) == 3
    assert all(len(s) == int(3.2 * 16000) for s in slices)
    # last slice zero-padded
    assert slices[-1][-1] == 0.0


def test_wav2vec_normalize():
    w = np.random.default_rng(0).standard_normal(1000).astype(np.float32) * 3 + 1
    n = wav2vec_normalize(w)
    assert abs(n.mean()) < 1e-4 and abs(n.std() - 1) < 1e-3


def test_pad_to_clip_multiple():
    wav = np.zeros(16000, np.float32)  # 1 s -> 25 frames
    w2, s2 = pad_to_clip_multiple(wav, 25, 12)
    assert s2 == 36 and len(w2) == 16000 + 11 * 640


def test_stack_audio_window():
    emb = jnp.arange(5)[:, None, None] * jnp.ones((5, 2, 3))
    out = stack_audio_window(emb, margin=2)
    assert out.shape == (5, 5, 2, 3)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), [0, 0, 0, 1, 2])
    np.testing.assert_allclose(np.asarray(out[4, :, 0, 0]), [2, 3, 4, 4, 4])


def test_interpolate_align_corners():
    x = np.asarray([[0.0], [1.0], [2.0], [3.0]])
    out = interpolate_align_corners(x, 7)
    np.testing.assert_allclose(out[:, 0], [0, 0.5, 1, 1.5, 2, 2.5, 3])


# ------------------------------------------------------------------ models
def test_wav2vec2_tiny_forward():
    model = Wav2Vec2Model(hidden_dim=32, num_layers=2, heads=4, ff_dim=64)
    rng = jax.random.PRNGKey(0)
    wav = jnp.zeros((1, 16000))  # 1 s
    params = model.init(rng, wav, 25)
    out = model.apply(params, wav, 25)
    assert out.shape == (1, 25, 2, 32)


def test_wavlm_tiny_forward():
    model = WavLMModel(hidden_dim=32, num_layers=2, heads=4, ff_dim=64)
    rng = jax.random.PRNGKey(0)
    wav = jnp.zeros((1, 16000))
    params = model.init(rng, wav)
    out = model.apply(params, wav)
    # 16000 samples -> conv stack stride 320 -> ~49 frames
    assert out.shape[0] == 1 and out.shape[2] == 32
    assert 45 <= out.shape[1] <= 50


def test_relative_position_buckets():
    b = relative_position_buckets(10, 10, num_buckets=32, max_distance=16)
    assert b.shape == (10, 10)
    assert b.min() >= 0 and b.max() < 32
    # symmetry structure: positive offsets use the upper half
    assert b[0, 5] >= 16 and b[5, 0] < 16
    np.testing.assert_array_equal(np.diag(b), 0)
