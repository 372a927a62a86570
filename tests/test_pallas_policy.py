"""Pallas-kernel auto policies: config resolution semantics.

Round-3 update: ``use_pallas_block: auto`` resolves to the NCL
(time-in-lanes) megakernel — hardware-trace A/B measured it 5.1x/4.4x
faster than the XLA inner loop at hop 256/64 (docs/PERF.md).  The down-path
kernel's auto stays OFF (still measured slower).
"""

from fastdiff_tpu.config import (ModelConfig, inference_model_config,
                                 resolve_pallas_block, resolve_pallas_down)


def test_block_auto_resolves_ncl():
    assert resolve_pallas_block({}) == "ncl"
    assert resolve_pallas_block({"use_pallas_block": "auto"}) == "ncl"
    assert resolve_pallas_block({"use_pallas_block": ""}) == "ncl"
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
    assert out.use_pallas_block == "ncl" and not out.use_pallas_down
    out = inference_model_config(cfg, {"use_pallas_block": "false"})
    assert out.use_pallas_block is False


def test_training_config_keeps_xla_on_auto():
    # from_hparams (the training path) only honors explicit True/"ncl";
    # 'auto' stays on the XLA path (kernels' VJPs recompute unfused anyway)
    cfg = ModelConfig.from_hparams({"use_pallas_block": "auto",
                                    "use_pallas_down": "auto"})
    assert not cfg.use_pallas_block and not cfg.use_pallas_down
    cfg = ModelConfig.from_hparams({"use_pallas_block": "ncl"})
    assert cfg.use_pallas_block == "ncl"
