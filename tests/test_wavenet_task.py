"""WaveNet denoiser as a trainable task family (denoiser: wavenet)."""

import numpy as np

import jax

from fastdiff_tpu.training.task import FastDiffTask


def test_wavenet_task_trains():
    hp = {
        "denoiser": "wavenet",
        "res_channels": 8, "skip_channels": 8, "num_res_layers": 2,
        "dilation_cycle": 2, "multiband": False,     # x256 = hop
        "audio_channels": 1, "cond_channels": 80,
        "diffusion_step_embed_dim_in": 16, "diffusion_step_embed_dim_mid": 32,
        "diffusion_step_embed_dim_out": 32, "compute_dtype": "float32",
        "T": 20, "beta_0": 1e-4, "beta_T": 0.05,
        "lr": 5e-3, "weight_decay": 0, "scheduler": "none",
        "optimizer_adam_beta1": 0.9, "optimizer_adam_beta2": 0.98,
        "clip_grad_norm": 1, "accumulate_grad_batches": 1,
        "seed": 0, "hop_size": 256, "max_samples": 2048, "max_sentences": 8,
        "binary_data_dir": "", "load_ckpt": "",
    }
    task = FastDiffTask(hp)
    state = task.build_state()
    rng = np.random.default_rng(0)
    batch = {
        "mels": rng.standard_normal((8, 4, 80)).astype(np.float32),
        "wavs": (rng.standard_normal((8, 4 * 256, 1)) * 0.2).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        state, metrics = task.train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # zero-init output conv starts at eps=0 (loss ~ E[z^2]=1); must improve
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.01, losses
