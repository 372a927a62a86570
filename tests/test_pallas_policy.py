"""Pallas-kernel auto policies: config resolution semantics."""

from fastdiff_tpu.config import (ModelConfig, inference_model_config,
                                 resolve_pallas_block, resolve_pallas_down)


def test_auto_resolves_off():
    # both kernels measured slower than the XLA path (docs/PERF.md):
    # 'auto' (and the yaml default) must resolve OFF
    for resolver in (resolve_pallas_block, resolve_pallas_down):
        assert resolver({}) is False
        assert resolver({"use_pallas_block": "auto",
                         "use_pallas_down": "auto"}) is False
        assert resolver({"use_pallas_block": "", "use_pallas_down": ""}) is False


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
    assert out.use_pallas_block and out.use_pallas_down
    out = inference_model_config(cfg, {})
    assert not out.use_pallas_block and not out.use_pallas_down


def test_training_config_ignores_auto():
    # from_hparams (the training path) treats anything but literal True as off
    cfg = ModelConfig.from_hparams({"use_pallas_block": "auto",
                                    "use_pallas_down": "auto"})
    assert not cfg.use_pallas_block and not cfg.use_pallas_down
