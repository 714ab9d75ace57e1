#!/usr/bin/env python
"""Stage-1 (SMGA audio->pose) training CLI (reference train_a2p.py +
SMGA.train_loop, SMGA.py:137-316): jitted Adan+EMA steps over a dp mesh."""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--feature_type", default=None)
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from mmgt_tpu.config import Stage1TrainConfig, load_config
    from mmgt_tpu.data.datasets import GestureDataset
    from mmgt_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from mmgt_tpu.training.stage1 import SMGA, transform_if_no_negative
    from mmgt_tpu.utils.checkpoint import CheckpointManager
    from mmgt_tpu.utils.metrics import MetricsLogger

    overrides = {
        k: v
        for k, v in {
            "batch_size": args.batch_size,
            "epochs": args.epochs,
            "feature_type": args.feature_type,
            "checkpoint_dir": args.checkpoint_dir,
            "data_dir": args.data_dir,
        }.items()
        if v is not None
    }
    cfg = load_config(Stage1TrainConfig, args.config, **overrides)

    smga = SMGA(
        feature_type=cfg.feature_type,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        ema_decay=cfg.ema_decay,
        guidance_weight=cfg.guidance_weight,
    )
    ds = GestureDataset(cfg.data_dir, cfg.feature_type)
    print(f"dataset: {len(ds)} clips")

    mesh = create_mesh()
    dp = mesh.shape["dp"]
    bs = max(cfg.batch_size // dp * dp, dp)

    rng = jax.random.PRNGKey(cfg.seed)
    state = smga.init_state(rng, batch_size=2)
    mgr = CheckpointManager(cfg.checkpoint_dir)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    step_fn = jax.jit(
        smga.train_step,
        in_shardings=(
            jax.tree.map(lambda _: replicated(mesh), state),
            {
                "keypoints": batch_sharding(mesh, 3),
                "cond_frame": batch_sharding(mesh, 2),
                "audio_features": batch_sharding(mesh, 3),
            },
            None,
        ),
    )

    steps_per_epoch = max(len(ds) // bs, 1)
    it = ds.batches(bs, cfg.seed)
    mlog = MetricsLogger(cfg.checkpoint_dir, "train_a2p")
    t0 = time.time()
    with mesh:
        for epoch in range(cfg.epochs):
            for _ in range(steps_per_epoch):
                batch = next(it)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                rng, r = jax.random.split(rng)
                state, metrics = step_fn(state, batch, r)
            if (epoch + 1) % 10 == 0 or epoch == 0:
                mlog.log(int(state.step), {"epoch": epoch + 1, **metrics}, echo=True)
            if (epoch + 1) % cfg.checkpoint_every_epochs == 0:
                mgr.save(int(state.step), state)
    mgr.save(int(state.step), state)
    print("done")


if __name__ == "__main__":
    main()
