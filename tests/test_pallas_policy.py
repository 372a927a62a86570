"""Pallas-kernel auto policies: config resolution semantics.

Round-3 update: ``use_pallas_block: auto`` resolves to the NCL
(time-in-lanes) megakernel ON TPU — hardware-trace A/B measured it
5.1x/4.4x faster than the XLA inner loop at hop 256/64 (docs/PERF.md) —
and to the XLA path on CPU/GPU, where the kernel would only run in Mosaic
interpret mode.  The down-path kernel's auto stays OFF (still measured
slower).  These tests run on the CPU backend (conftest).
"""

from fastdiff_tpu.config import (ModelConfig, inference_model_config,
                                 resolve_pallas_block, resolve_pallas_down)


def test_block_auto_is_backend_aware():
    # CPU backend here: auto avoids interpret-mode Pallas
    assert resolve_pallas_block({}) is False
    assert resolve_pallas_block({"use_pallas_block": "auto"}) is False
    assert resolve_pallas_block({"use_pallas_block": ""}) is False
    # explicit ncl forces the kernel on any backend
    assert resolve_pallas_block({"use_pallas_block": "ncl"}) == "ncl"


def test_down_auto_resolves_off():
    assert resolve_pallas_down({}) is False
    assert resolve_pallas_down({"use_pallas_down": "auto"}) is False
    assert resolve_pallas_down({"use_pallas_down": ""}) is False


def test_explicit_values_win():
    assert resolve_pallas_block({"use_pallas_block": True}) is True
    assert resolve_pallas_block({"use_pallas_block": "true"}) is True
    assert resolve_pallas_block({"use_pallas_block": "false"}) is False
    assert resolve_pallas_down({"use_pallas_down": "on"}) is True
    assert resolve_pallas_down({"use_pallas_down": False}) is False


def test_inference_model_config_applies_both():
    cfg = ModelConfig()
    out = inference_model_config(cfg, {"use_pallas_block": "true",
                                       "use_pallas_down": "true"})
    assert out.use_pallas_block is True and out.use_pallas_down
    out = inference_model_config(cfg, {})
    # CPU backend: auto -> XLA path (on TPU it resolves to "ncl")
    assert out.use_pallas_block is False and not out.use_pallas_down
    out = inference_model_config(cfg, {"use_pallas_block": "ncl"})
    assert out.use_pallas_block == "ncl"
    out = inference_model_config(cfg, {"use_pallas_block": "false"})
    assert out.use_pallas_block is False


def test_training_config_auto_is_backend_aware():
    # from_hparams (the training path) resolves 'auto' backend-aware via
    # resolve_train_block: on CPU (this suite) it stays on the XLA path —
    # the megakernel would only run in Mosaic interpret mode; on TPU it
    # resolves to "ncl_vjp", the winner of the r5 four-route train-step
    # bench (28.4 ms/step vs xla 50.0, docs/PERF.md). 'ncl' is
    # inference-only (no VJP) and coerces to the XLA path here.
    cfg = ModelConfig.from_hparams({"use_pallas_block": "auto",
                                    "use_pallas_down": "auto"})
    assert not cfg.use_pallas_block and not cfg.use_pallas_down
    cfg = ModelConfig.from_hparams({"use_pallas_block": "ncl"})
    assert cfg.use_pallas_block is False
    cfg = ModelConfig.from_hparams({"use_pallas_block": True})
    assert cfg.use_pallas_block is True
    # explicit trainable-route strings pass through on any backend
    cfg = ModelConfig.from_hparams({"use_pallas_block": "ncl_vjp"})
    assert cfg.use_pallas_block == "ncl_vjp"
    cfg = ModelConfig.from_hparams({"use_pallas_block": "ncl_sr"})
    assert cfg.use_pallas_block == "ncl_sr"
    cfg = ModelConfig.from_hparams({"use_pallas_block": "false"})
    assert cfg.use_pallas_block is False
