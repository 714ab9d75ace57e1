#!/usr/bin/env python
"""Stage-1 dataset preparation: (videos or keypoints) + wavs ->
aligned 3.2 s clips of keypoints + audio features.

Replaces the reference's data/create_dataset.py:10-31 + data/slice.py
drivers + data/audio_extraction/*: slices audio into 3.2 s windows,
extracts baseline (and optionally WavLM) features per slice, slices the
matching keypoint tracks into 80-frame windows, and normalizes keypoints
to [0, 1] of the -200..800 range the SMGA trainer expects.

Inputs:
  src/wavs/{name}.wav
  src/keypoints/{name}.npy      (T, 402) absolute coords @25 fps
    (produce with mmgt_tpu.data.dwpose_infer.DWPoseDetector or any
     pose tracker emitting the 134-keypoint layout)
Outputs:
  out/keypoints/{name}_sN.npy   (80, 402) in [0, 1]
  out/baseline_feats/{name}_sN.npy  (80, 35)
  out/wavlm_feats/{name}_sN.npy     (80, 1059)  [with --wavlm weights]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--wavlm_ckpt", default=None,
                    help="WavLM-Large checkpoint for wavlm features")
    ap.add_argument("--fps", type=int, default=25)
    args = ap.parse_args()

    from mmgt_tpu.data.audio import (
        SAMPLE_RATE,
        WavLMFeatureExtractor,
        slice_audio,
        stage1_condition,
    )
    from mmgt_tpu.data.conditioning import KP_MIN, KP_MAX, mask_leg
    from mmgt_tpu.data.dsp import load_wav

    src, out = Path(args.src), Path(args.out)
    horizon = int(3.2 * args.fps)
    for d in ("keypoints", "baseline_feats") + (
        ("wavlm_feats",) if args.wavlm_ckpt else ()
    ):
        (out / d).mkdir(parents=True, exist_ok=True)

    wavlm_ext = None
    if args.wavlm_ckpt:
        import jax, jax.numpy as jnp

        from mmgt_tpu.models.wavlm import WavLMModel
        from mmgt_tpu.utils import convert as cv

        model = WavLMModel()
        tree = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
        )
        sd = cv.load_torch_state_dict(args.wavlm_ckpt)
        params, report = cv.convert(tree, [sd], cv.map_wavlm)
        if report["missing"]:
            print(f"[warn] wavlm: {len(report['missing'])} missing", file=sys.stderr)
        wavlm_ext = WavLMFeatureExtractor(model, jax.tree.map(jnp.asarray, params))

    n_out = 0
    for wav_path in sorted((src / "wavs").glob("*.wav")):
        name = wav_path.stem
        kp_path = src / "keypoints" / f"{name}.npy"
        if not kp_path.exists():
            print(f"[skip] {name}: no keypoints", file=sys.stderr)
            continue
        wav = load_wav(str(wav_path), SAMPLE_RATE)
        kps = np.load(kp_path).astype(np.float32)
        kps = np.asarray(mask_leg(kps))
        kps01 = (kps - KP_MIN) / (KP_MAX - KP_MIN)  # [0,1]; trainer maps to [-1,1]

        slices = slice_audio(wav)
        for si, sl in enumerate(slices):
            k0 = si * horizon
            kp_slice = kps01[k0 : k0 + horizon]
            if len(kp_slice) < horizon:
                break
            feats = stage1_condition(
                sl, wavlm_ext, "wavlm" if wavlm_ext else "baseline"
            )
            tag = f"{name}_s{si}"
            np.save(out / "keypoints" / f"{tag}.npy", kp_slice)
            if wavlm_ext:
                np.save(out / "wavlm_feats" / f"{tag}.npy", feats)
                np.save(
                    out / "baseline_feats" / f"{tag}.npy", feats[:, 1024:]
                )
            else:
                np.save(out / "baseline_feats" / f"{tag}.npy", feats)
            n_out += 1
    print(f"wrote {n_out} aligned clips to {out}")


if __name__ == "__main__":
    main()
