"""FastSpeech2 task: end-to-end TTS training on binarized data + synthesis."""

import numpy as np
import pytest

from fastdiff_tpu.data.tts_binarizer import TTSBinarizer
from fastdiff_tpu.training.tts_task import FastSpeech2Task, collate_tts
from tests.test_tts_binarizer import _make_tts_dataset


@pytest.fixture(scope="module")
def tts_data(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("tts_task")
    hp = _make_tts_dataset(tmp_path, n_items=5)
    hp.update({
        "max_samples": 256,          # minimal length filter for TTS items
        "max_sentences": 2, "max_valid_sentences": 1,
        "hidden_size": 32, "enc_layers": 1, "dec_layers": 1, "num_heads": 2,
        "ffn_hidden": 64, "enc_ffn_kernel_size": 3, "max_frames": 200,
        "use_pitch_embed": True, "lr": 1e-3, "weight_decay": 0,
        "scheduler": "none", "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "clip_grad_norm": 1,
        "accumulate_grad_batches": 1, "seed": 0,
        "vocoder": "glmel", "griffin_lim_iters": 4,
        "test_input_dir": "", "test_mel_dir": "", "endless_ds": True,
    })
    TTSBinarizer(hp).process()
    return hp


def test_collate_shapes(tts_data):
    from fastdiff_tpu.data.dataset import VocoderDataset
    ds = VocoderDataset(tts_data, "train")
    items = [ds[i] for i in range(2)]
    batch = collate_tts(items, 16, 64, 80)
    assert batch["tokens"].shape == (2, 16)
    assert batch["mels"].shape == (2, 64, 80)
    assert batch["mel2ph"].max() <= 16
    assert batch["dur"].sum(axis=1).max() <= 64


def test_tts_training_step_and_val(tts_data):
    task = FastSpeech2Task(tts_data)
    state = task.build_state()
    loader = task.train_dataloader()
    batch = next(loader)
    state, losses = task.train_step(state, batch)
    assert np.isfinite(float(losses["total"]))
    state, losses2 = task.train_step(state, next(loader))
    assert np.isfinite(float(losses2["total"]))

    val = task.val_step(state, batch)
    assert "mel" in val and np.isfinite(val["mel"])


def test_trainer_drives_tts_task(tts_data, tmp_path):
    """The generic Trainer loop must run the TTS task (fit for a few steps,
    checkpoints written)."""
    import glob
    import os
    from fastdiff_tpu.training.trainer import Trainer
    hp = dict(tts_data)
    hp.update(max_updates=4, val_check_interval=2, num_sanity_val_steps=1,
              tb_log_interval=2, eval_max_batches=1, num_ckpt_keep=2,
              work_dir=str(tmp_path / "fs2_work"))
    task = FastSpeech2Task(hp)
    trainer = Trainer(task, hp["work_dir"])
    result = trainer.fit()
    assert result["step"] == 4
    assert glob.glob(os.path.join(hp["work_dir"], "model_ckpt_steps_*.ckpt"))


def test_tts_infer_to_wav(tts_data, tmp_path):
    task = FastSpeech2Task(tts_data)
    state = task.build_state()
    tokens = np.asarray([3, 4, 5, 6], np.int32)
    out = str(tmp_path / "tts.wav")
    wav = task.infer_to_wav(state, tokens, out)
    assert len(wav) > 0 and np.isfinite(wav).all()
    import os
    assert os.path.exists(out)


def test_val_figures_logged(tts_data, tmp_path):
    """Validation logs GT-vs-pred mel figures through ScalarLogger
    (reference behavior: tasks/tts/tts_base.py:224-245)."""
    import glob
    import os

    from fastdiff_tpu.utils.logging_utils import ScalarLogger

    task = FastSpeech2Task(tts_data)
    state = task.build_state()
    batch = next(task.val_dataloader())
    figs = task.val_figures(state, batch)
    assert figs, "val_figures returned nothing"

    logger = ScalarLogger(str(tmp_path / "tb"))
    for tag, fig in figs.items():
        logger.log_figure(tag, fig, step=7)
    logger.close()
    pngs = glob.glob(os.path.join(str(tmp_path / "tb"), "figures", "*_7.png"))
    assert len(pngs) == len(figs)


def test_trainer_evaluate_writes_figures(tts_data, tmp_path):
    """The Trainer's validation pass wires task.val_figures into the logger."""
    import glob
    import os

    from fastdiff_tpu.training.trainer import Trainer

    task = FastSpeech2Task(tts_data)
    trainer = Trainer(task, str(tmp_path / "work"))
    state = task.build_state()
    trainer.evaluate(state, max_batches=1, step=3)
    pngs = glob.glob(os.path.join(str(tmp_path / "work"), "tb_logs",
                                  "figures", "*_3.png"))
    assert pngs, "no validation figures written"
