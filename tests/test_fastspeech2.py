"""FastSpeech 2 acoustic model: shapes, mel2ph/duration math, training step,
and the variance adaptor (frame/cwt pitch, uv, energy) with its loss options
(reference semantics: tasks/tts/fs2.py:100-172, tasks/tts/tts_base.py:182-223)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdiff_tpu.models.fastspeech2 import (FS2Config, dur_to_mel2ph,
                                             fastspeech2_apply,
                                             fastspeech2_loss,
                                             init_fastspeech2, mel2ph_to_dur,
                                             mel_energy)

CFG = FS2Config(vocab_size=20, hidden=32, enc_layers=2, dec_layers=2,
                num_heads=2, ffn_hidden=64, ffn_kernel=3, n_mels=8,
                max_len=40, predictor_hidden=16, use_pitch=True,
                pitch_type="frame", use_uv=True)


def _toy_batch(cfg, seed=1, b=1, t_ph=6, t_mel=20):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (b, t_ph)))
    dur_gt = jnp.asarray(rng.integers(2, 5, (b, t_ph)), jnp.float32)
    scale = t_mel / np.asarray(dur_gt.sum(-1))
    dur_gt = jnp.floor(dur_gt * scale[:, None])
    mel2ph = dur_to_mel2ph(dur_gt, t_mel)
    f0_hz = rng.uniform(80, 300, (b, t_mel)).astype(np.float32)
    f0_hz[:, ::5] = 0.0                                  # unvoiced frames
    from fastdiff_tpu.ops.pitch import norm_interp_f0
    f0 = np.zeros((b, t_mel), np.float32)
    uv = np.zeros((b, t_mel), np.float32)
    for i in range(b):
        f0[i], uv[i] = norm_interp_f0(f0_hz[i])
    mels = jnp.asarray(rng.standard_normal((b, t_mel, cfg.n_mels)) * 0.5,
                       jnp.float32)
    batch = {"tokens": tokens, "mels": mels, "mel2ph": mel2ph,
             "dur": dur_gt, "f0": jnp.asarray(f0), "uv": jnp.asarray(uv),
             "energy": mel_energy(mels),
             "pitch": jnp.asarray(rng.integers(1, 255, (b, t_mel))),
             "is_sil": jnp.zeros((b, t_ph), jnp.float32)}
    if cfg.pitch_type == "cwt":
        from fastdiff_tpu.ops.cwt import f0_to_cwt
        spec = np.zeros((b, t_mel, 10), np.float32)
        mean = np.zeros((b,), np.float32)
        std = np.ones((b,), np.float32)
        for i in range(b):
            s, m, sd = f0_to_cwt(f0_hz[i])
            spec[i] = s[:t_mel]
            mean[i], std[i] = m, sd
        batch.update(cwt_spec=jnp.asarray(spec), cwt_mean=jnp.asarray(mean),
                     cwt_std=jnp.asarray(std))
    return batch


def _train_kwargs(cfg, batch):
    kw = dict(mel2ph=batch["mel2ph"])
    if cfg.pitch_type == "coarse":
        kw["pitch"] = batch["pitch"]
    else:
        kw["f0"], kw["uv"] = batch["f0"], batch["uv"]
    if cfg.use_energy:
        kw["energy"] = batch["energy"]
    return kw


def _learning_run(cfg, mel_cfg=None, steps=30, seed=0):
    import optax
    params = init_fastspeech2(jax.random.PRNGKey(seed), cfg)
    batch = _toy_batch(cfg)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = fastspeech2_apply(p, batch["tokens"], cfg,
                                **_train_kwargs(cfg, batch))
        return fastspeech2_loss(out, batch, cfg,
                                mel_loss_and_lambda=mel_cfg)["total"]

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return losses


def test_dur_mel2ph_roundtrip():
    dur = jnp.asarray([[3, 2, 0, 4], [1, 1, 1, 0]], jnp.float32)
    mel2ph = dur_to_mel2ph(dur, 12)
    np.testing.assert_array_equal(
        np.asarray(mel2ph[0]), [1, 1, 1, 2, 2, 4, 4, 4, 4, 0, 0, 0])
    back = mel2ph_to_dur(mel2ph, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(dur))


def test_forward_training_mode_frame_pitch():
    params = init_fastspeech2(jax.random.PRNGKey(0), CFG)
    batch = _toy_batch(CFG, b=2)
    out = fastspeech2_apply(params, batch["tokens"], CFG,
                            **_train_kwargs(CFG, batch))
    assert out["mel"].shape == (2, 20, 8)
    assert out["dur_pred"].shape == batch["tokens"].shape
    # frame mode emits f0/uv predictions and a denormalized f0 track
    assert out["f0_pred"].shape == (2, 20)
    assert out["uv_pred"].shape == (2, 20)
    assert np.isfinite(np.asarray(out["f0_denorm"])).all()
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_forward_inference_mode():
    params = init_fastspeech2(jax.random.PRNGKey(0), CFG)
    tokens = jnp.asarray([[4, 5, 6, 0]])
    out = fastspeech2_apply(params, tokens, CFG, t_mel=30)
    assert out["mel"].shape == (1, 30, 8)
    assert out["mel2ph"].shape == (1, 30)
    # padding phones contribute no frames
    assert int(out["mel2ph"].max()) <= 3
    # inference produces a denormalized f0 with unvoiced zeros allowed
    assert np.isfinite(np.asarray(out["f0_denorm"])).all()


def test_training_reduces_loss_frame_pitch():
    losses = _learning_run(CFG)
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_uv_loss_present_and_finite():
    params = init_fastspeech2(jax.random.PRNGKey(0), CFG)
    batch = _toy_batch(CFG)
    out = fastspeech2_apply(params, batch["tokens"], CFG,
                            **_train_kwargs(CFG, batch))
    losses = fastspeech2_loss(out, batch, CFG)
    for key in ("uv", "f0", "pdur"):
        assert key in losses and np.isfinite(float(losses[key])), key


def test_energy_adaptor_learns():
    cfg = dataclasses.replace(CFG, use_energy=True)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    assert "energy_predictor" in params and "energy_embed" in params
    batch = _toy_batch(cfg)
    out = fastspeech2_apply(params, batch["tokens"], cfg,
                            **_train_kwargs(cfg, batch))
    losses = fastspeech2_loss(out, batch, cfg)
    assert "energy" in losses and np.isfinite(float(losses["energy"]))
    run = _learning_run(cfg)
    assert run[-1] < run[0] * 0.8, run[:3] + run[-3:]


def test_cwt_pitch_mode_learns():
    cfg = dataclasses.replace(CFG, pitch_type="cwt")
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    batch = _toy_batch(cfg)
    out = fastspeech2_apply(params, batch["tokens"], cfg,
                            **_train_kwargs(cfg, batch))
    assert out["cwt_pred"].shape == (1, 20, 10)
    losses = fastspeech2_loss(out, batch, cfg)
    for key in ("cwt", "cwt_stats", "uv"):
        assert key in losses and np.isfinite(float(losses[key])), key
    run = _learning_run(cfg)
    assert run[-1] < run[0] * 0.8, run[:3] + run[-3:]


def test_cwt_inference_reconstructs_f0():
    cfg = dataclasses.replace(CFG, pitch_type="cwt")
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray([[4, 5, 6, 7]])
    out = fastspeech2_apply(params, tokens, cfg, t_mel=24)
    f0 = np.asarray(out["f0_denorm"])
    assert f0.shape == (1, 24)
    assert np.isfinite(f0).all() and (f0 >= 0).all()


def test_legacy_coarse_pitch_mode():
    cfg = dataclasses.replace(CFG, pitch_type="coarse", use_uv=False)
    run = _learning_run(cfg)
    assert run[-1] < run[0] * 0.8, run[:3] + run[-3:]


def test_ssim_gdl_mel_loss_options():
    cfg = CFG
    run = _learning_run(cfg, mel_cfg={"l1": 0.5, "ssim": 0.5, "gdl": 0.1})
    assert np.isfinite(run).all()
    assert run[-1] < run[0] * 0.9, run[:3] + run[-3:]


def test_mel_loss_components():
    from fastdiff_tpu.ops.mel_losses import (gdl_mel_loss, parse_mel_losses,
                                             ssim_mel_loss)
    assert parse_mel_losses("l1:0.5|ssim:0.5") == {"l1": 0.5, "ssim": 0.5}
    assert parse_mel_losses("l1") == {"l1": 1.0}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 16)), jnp.float32)
    # identical inputs -> zero loss
    assert float(ssim_mel_loss(x, x)) < 1e-5
    assert float(gdl_mel_loss(x, x)) == 0.0
    y = x + 0.5 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    assert float(ssim_mel_loss(y, x)) > 0.01
    assert float(gdl_mel_loss(y, x)) > 0.01


def test_word_sent_duration_losses():
    cfg = CFG
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    batch = _toy_batch(cfg)
    # mark token 2 as a silence boundary -> two words
    is_sil = np.zeros(batch["tokens"].shape, np.float32)
    is_sil[:, 2] = 1.0
    batch["is_sil"] = jnp.asarray(is_sil)
    out = fastspeech2_apply(params, batch["tokens"], cfg,
                            **_train_kwargs(cfg, batch))
    losses = fastspeech2_loss(out, batch, cfg,
                              lambdas={"lambda_word_dur": 1.0,
                                       "lambda_sent_dur": 1.0})
    for key in ("pdur", "wdur", "sdur"):
        assert key in losses and np.isfinite(float(losses[key])), key
