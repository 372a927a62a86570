"""FastSpeech 2 acoustic model: shapes, mel2ph/duration math, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.models.fastspeech2 import (FS2Config, dur_to_mel2ph,
                                             fastspeech2_apply,
                                             fastspeech2_loss,
                                             init_fastspeech2, mel2ph_to_dur)

CFG = FS2Config(vocab_size=20, hidden=32, enc_layers=2, dec_layers=2,
                num_heads=2, ffn_hidden=64, ffn_kernel=3, n_mels=8,
                max_len=40, predictor_hidden=16, use_pitch=True)


def test_dur_mel2ph_roundtrip():
    dur = jnp.asarray([[3, 2, 0, 4], [1, 1, 1, 0]], jnp.float32)
    mel2ph = dur_to_mel2ph(dur, 12)
    np.testing.assert_array_equal(
        np.asarray(mel2ph[0]), [1, 1, 1, 2, 2, 4, 4, 4, 4, 0, 0, 0])
    back = mel2ph_to_dur(mel2ph, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dur))


def test_forward_training_mode():
    params = init_fastspeech2(jax.random.PRNGKey(0), CFG)
    b, t_ph, t_mel = 2, 6, 20
    tokens = jnp.asarray([[4, 5, 6, 7, 0, 0], [3, 4, 5, 6, 7, 8]])
    rng = np.random.default_rng(0)
    mel2ph = jnp.asarray(np.minimum(rng.integers(1, 5, (b, t_mel)),
                                    (tokens > 0).sum(-1)[:, None]))
    pitch = jnp.asarray(rng.integers(1, 255, (b, t_mel)))
    out = fastspeech2_apply(params, tokens, CFG, mel2ph=mel2ph, pitch=pitch)
    assert out["mel"].shape == (b, t_mel, 8)
    assert out["dur_pred"].shape == (b, t_ph)
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_forward_inference_mode():
    params = init_fastspeech2(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray([[4, 5, 6, 0]])
    out = fastspeech2_apply(params, tokens, CFG, t_mel=30)
    assert out["mel"].shape == (1, 30, 8)
    assert out["mel2ph"].shape == (1, 30)
    # padding phones contribute no frames
    assert int(out["mel2ph"].max()) <= 3


def test_training_reduces_loss():
    cfg = CFG
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray([[4, 5, 6, 7, 8, 9]])
    dur_gt = jnp.asarray([[3, 3, 3, 3, 4, 4]], jnp.float32)
    mel2ph = dur_to_mel2ph(dur_gt, 20)
    mel_gt = jnp.asarray(rng.standard_normal((1, 20, 8)), jnp.float32)
    pitch = jnp.asarray(rng.integers(1, 255, (1, 20)))
    src_mask = (tokens > 0).astype(jnp.float32)

    import optax
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = fastspeech2_apply(p, tokens, cfg, mel2ph=mel2ph, pitch=pitch)
        return fastspeech2_loss(out, mel_gt, dur_gt, src_mask,
                                pitch_gt=pitch)["total"]

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
