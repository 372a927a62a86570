"""Config system: cascade inheritance, saved-config precedence, overrides."""

import os

import yaml

from fastdiff_tpu.utils.hparams import (apply_overrides, load_config_cascade,
                                        set_hparams)


def _write(path, data):
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def test_base_config_cascade(tmp_path):
    _write(tmp_path / "base.yaml", {"a": 1, "b": {"x": 1, "y": 2}, "c": 3})
    _write(tmp_path / "child.yaml",
           {"base_config": ["./base.yaml"], "b": {"y": 20}, "d": 4})
    cfg = load_config_cascade(str(tmp_path / "child.yaml"))
    assert cfg["a"] == 1
    assert cfg["b"] == {"x": 1, "y": 20}     # nested dict-merge override
    assert cfg["c"] == 3 and cfg["d"] == 4


def test_cascade_cycle_guard(tmp_path):
    _write(tmp_path / "a.yaml", {"base_config": ["./b.yaml"], "va": 1})
    _write(tmp_path / "b.yaml", {"base_config": ["./a.yaml"], "vb": 2})
    cfg = load_config_cascade(str(tmp_path / "a.yaml"))
    assert cfg["va"] == 1 and cfg["vb"] == 2


def test_saved_config_precedence(tmp_path, monkeypatch):
    """A previously saved checkpoints/<exp>/config.yaml wins over the config
    file unless --reset (reference: utils/hparams.py:70-84)."""
    monkeypatch.chdir(tmp_path)
    _write(tmp_path / "conf.yaml", {"lr": 1e-4, "tag": "file"})

    # first run saves the merged config
    cfg = set_hparams(config="conf.yaml", exp_name="exp1",
                      print_hparams=False, global_hparams=False)
    assert os.path.exists("checkpoints/exp1/config.yaml")
    assert cfg["tag"] == "file"

    # change the file; saved config still wins
    _write(tmp_path / "conf.yaml", {"lr": 5e-4, "tag": "changed"})
    cfg2 = set_hparams(config="conf.yaml", exp_name="exp1",
                       print_hparams=False, global_hparams=False)
    assert cfg2["tag"] == "file" and cfg2["lr"] == 1e-4

    # --reset takes the file again
    import argparse
    args = argparse.Namespace(config="conf.yaml", exp_name="exp1",
                              hparams="", infer=False, validate=False,
                              reset=True, remove=False, debug=False)
    cfg3 = set_hparams(print_hparams=False, global_hparams=False, args=args)
    assert cfg3["tag"] == "changed" and cfg3["lr"] == 5e-4


def test_override_type_coercion():
    cfg = {"lr": 2e-4, "n": 5, "flag": True, "lst": [1, 2], "d": {"k": 1},
           "s": "x"}
    apply_overrides(cfg, "lr=1e-5,n=7,flag=False,lst=[3 4 5],d.k=9,s=hello,new=0.5")
    assert cfg["lr"] == 1e-5 and isinstance(cfg["lr"], float)
    assert cfg["n"] == 7 and isinstance(cfg["n"], int)
    assert cfg["flag"] is False
    assert cfg["lst"] == [3, 4, 5]
    assert cfg["d"]["k"] == 9
    assert cfg["s"] == "hello"
    assert cfg["new"] == 0.5
