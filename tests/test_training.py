"""End-to-end training: task + trainer over the 8-device CPU mesh —
train steps reduce loss, checkpoints round-trip, resume works, inference
writes wavs. This is the TPU-native analog of multi-GPU DDP testing the
reference never had (SURVEY.md §4)."""

import glob
import os

import numpy as np
import pytest

import jax

from fastdiff_tpu.data.binarizer import VocoderBinarizer
from fastdiff_tpu.training.task import FastDiffTask
from fastdiff_tpu.training.trainer import Trainer
from fastdiff_tpu.utils import audio_io


def _tiny_hparams(tmp_path):
    """A tiny but structurally complete config: full pipeline, small model."""
    raw = tmp_path / "raw"
    raw.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    sr = 22050
    with open(tmp_path / "metadata_phone.csv", "w") as f:
        f.write("item_name,wav_fn\n")
        for i in range(6):
            t = np.arange(sr) / sr
            wav = (0.4 * np.sin(2 * np.pi * (220 + 40 * i) * t)
                   + 0.02 * rng.standard_normal(sr)).astype(np.float32)
            fn = str(raw / f"u{i}.wav")
            audio_io.save_wav(wav, fn, sr)
            f.write(f"u{i},{fn}\n")

    return {
        "processed_data_dir": str(tmp_path),
        "binary_data_dir": str(tmp_path / "binary"),
        "work_dir": str(tmp_path / "work"),
        "audio_sample_rate": sr, "audio_num_mel_bins": 80,
        "fft_size": 1024, "hop_size": 256, "win_size": 1024,
        "fmin": 80, "fmax": 7600, "test_num": 2,
        # model: tiny
        "audio_channels": 1, "inner_channels": 8, "cond_channels": 80,
        "upsample_ratios": [8, 8, 4], "lvc_layers_each_block": 1,
        "lvc_kernel_size": 3, "kpnet_hidden_channels": 8, "kpnet_conv_size": 3,
        "dropout": 0.0, "diffusion_step_embed_dim_in": 16,
        "diffusion_step_embed_dim_mid": 32, "diffusion_step_embed_dim_out": 32,
        "use_weight_norm": True, "compute_dtype": "float32",
        # diffusion
        "T": 50, "beta_0": 1e-4, "beta_T": 0.05, "noise_schedule": "", "N": 4,
        # training
        "max_updates": 12, "max_samples": 4096, "max_sentences": 8,
        "max_valid_sentences": 2, "val_check_interval": 6,
        "num_sanity_val_steps": 1, "tb_log_interval": 4,
        "lr": 1e-3, "weight_decay": 0, "scheduler": "none",
        "optimizer_adam_beta1": 0.9, "optimizer_adam_beta2": 0.98,
        "clip_grad_norm": 1, "accumulate_grad_batches": 1,
        "num_ckpt_keep": 2, "save_best": True, "seed": 1234,
        "valid_monitor_key": "val_loss", "valid_monitor_mode": "min",
        "endless_ds": True, "eval_max_batches": 2, "amp": False,
        "binarization_args": {"with_wav": True, "shuffle": False},
        "pre_align_args": {}, "N_PROC": 1,
        "test_input_dir": "", "test_mel_dir": "", "use_wav": True,
        "save_gt": True, "gen_dir_name": "", "resume_from_checkpoint": 0,
        "load_ckpt": "",
        "binarizer_cls": "fastdiff_tpu.data.binarizer.VocoderBinarizer",
        "train_set_name": "train", "valid_set_name": "valid",
        "test_set_name": "test",
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train_e2e")
    hp = _tiny_hparams(tmp_path)
    VocoderBinarizer(hp).process()
    task = FastDiffTask(hp)
    trainer = Trainer(task, hp["work_dir"])
    result = trainer.fit()
    return tmp_path, hp, result


def test_mesh_spans_8_devices(trained):
    _, hp, _ = trained
    task = FastDiffTask(hp)
    assert task.mesh.devices.size == 8
    assert task.mesh.axis_names == ("dp",)


def test_training_runs_and_loss_finite(trained):
    _, _, result = trained
    assert result["step"] == 12
    assert np.isfinite(result["val"]["loss"])


def test_checkpoints_written_with_retention(trained):
    tmp_path, hp, _ = trained
    ckpts = sorted(glob.glob(os.path.join(hp["work_dir"], "model_ckpt_steps_*.ckpt")))
    assert len(ckpts) <= 2          # num_ckpt_keep
    assert os.path.exists(os.path.join(hp["work_dir"], "model_ckpt_best.pt"))
    assert any("12" in c for c in ckpts)


def test_resume_continues_from_step(trained):
    tmp_path, hp, result = trained
    hp2 = dict(hp)
    hp2["max_updates"] = 14
    task = FastDiffTask(hp2)
    trainer = Trainer(task, hp2["work_dir"])
    result2 = trainer.fit()
    assert result2["step"] == 14


def test_training_reduces_loss_on_overfit(tmp_path):
    """Tiny model overfitting one batch: loss after training < loss before."""
    hp = _tiny_hparams(tmp_path)
    hp.update(max_updates=30, max_sentences=8, val_check_interval=1000,
              num_sanity_val_steps=0, tb_log_interval=10,
              work_dir=str(tmp_path / "work2"))
    VocoderBinarizer(hp).process()
    task = FastDiffTask(hp)
    state = task.build_state()
    batch = next(task.train_dataloader())
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, metrics = task.train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_inference_from_raw_wav_dir(trained, tmp_path):
    """wav->wav inference: --infer with test_input_dir featurizes raw wavs
    through the binarizer front-end (dataset_utils.py:167-184 path)."""
    _, hp, _ = trained
    wav_dir = str(tmp_path / "raw_in")
    os.makedirs(wav_dir, exist_ok=True)
    sr = 22050
    t = np.arange(sr // 2) / sr
    audio_io.save_wav((0.4 * np.sin(2 * np.pi * 260 * t)).astype(np.float32),
                      os.path.join(wav_dir, "in0.wav"), sr)
    hp2 = dict(hp)
    hp2.update(test_input_dir=wav_dir, gen_dir_name="rawwav")
    task = FastDiffTask(hp2)
    trainer = Trainer(task, hp2["work_dir"])
    results = trainer.test()
    assert len(results) == 1
    gen = glob.glob(os.path.join(hp2["work_dir"], "generated_*rawwav"))[0]
    preds = glob.glob(os.path.join(gen, "*_pred.wav"))
    assert len(preds) == 1
    wav, _ = audio_io.load_wav(preds[0])
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_ema_tracking(tmp_path):
    """ema_decay > 0 tracks an EMA copy, checkpoints it, and inference
    prefers it."""
    hp = _tiny_hparams(tmp_path)
    hp.update(ema_decay=0.9, max_updates=4, val_check_interval=2,
              num_sanity_val_steps=0, tb_log_interval=2, eval_max_batches=1,
              work_dir=str(tmp_path / "work_ema"))
    VocoderBinarizer(hp).process()
    task = FastDiffTask(hp)
    state = task.build_state()
    assert "ema" in state
    batch = next(task.train_dataloader())
    state2, _ = task.train_step(state, batch, jax.random.PRNGKey(0))
    # EMA moved toward params but isn't equal to them
    p = jax.tree_util.tree_leaves(state2["params"])[0]
    e = jax.tree_util.tree_leaves(state2["ema"])[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))

    trainer = Trainer(task, hp["work_dir"])
    result = trainer.fit(state2)
    # resume restores the ema branch
    task2 = FastDiffTask(hp)
    state3, step = Trainer(task2, hp["work_dir"]).restore(task2.build_state())
    assert "ema" in state3 and step >= 4


def test_inference_writes_wavs(trained):
    tmp_path, hp, _ = trained
    task = FastDiffTask(hp)
    trainer = Trainer(task, hp["work_dir"])
    results = trainer.test()
    assert len(results) == 2        # test split = 2 items
    gen_dirs = [d for d in glob.glob(os.path.join(hp["work_dir"], "generated_*"))
                if d.endswith("_")]          # default gen_dir_name='' suffix
    assert gen_dirs
    preds = glob.glob(os.path.join(gen_dirs[0], "*_pred.wav"))
    gts = glob.glob(os.path.join(gen_dirs[0], "*_gt.wav"))
    assert len(preds) == 2 and len(gts) == 2
    wav, sr = audio_io.load_wav(preds[0])
    assert sr == 22050 and len(wav) > 0 and np.isfinite(wav).all()
