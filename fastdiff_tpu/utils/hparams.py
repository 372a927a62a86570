"""Hierarchical YAML config system with CLI overrides.

Behavior-compatible with the reference config layer
(reference: utils/hparams.py:25-126):

- ``base_config:`` lists are resolved depth-first with dict-merge override
  semantics and a cycle guard; relative paths resolve against the including
  file (reference: utils/hparams.py:48-68).
- When ``--exp_name`` is given, a previously saved
  ``checkpoints/<exp>/config.yaml`` takes precedence over the config file
  unless ``--reset`` (reference: utils/hparams.py:70-84).
- ``--hparams "a=1,b.c=2,d=[1 1 1]"`` dotted-key overrides: bools / lists /
  dicts go through ``ast.literal_eval`` (spaces in lists become commas),
  everything else is cast to the existing value's type
  (reference: utils/hparams.py:87-101).
- The merged config is persisted to the work dir so experiments resume their
  hyperparameters (reference: utils/hparams.py:106-109).

Unlike the reference, the global ``hparams`` dict never leaks into jitted
code: model/diffusion/training code receives frozen config dataclasses built
once from this dict (see fastdiff_tpu/config.py).
"""

import argparse
import ast
import os
import shutil

import yaml

hparams = {}
_printed_once = False


def _deep_merge(dst: dict, src: dict) -> None:
    """Merge ``src`` into ``dst`` in place; nested dicts merge recursively."""
    for key, val in src.items():
        if isinstance(val, dict) and isinstance(dst.get(key), dict):
            _deep_merge(dst[key], val)
        else:
            dst[key] = val


def load_config_cascade(config_path: str, _seen=None) -> dict:
    """Load a YAML file, resolving its ``base_config`` ancestry depth-first."""
    if _seen is None:
        _seen = set()
    if not os.path.exists(config_path):
        return {}
    _seen.add(os.path.normpath(config_path))
    with open(config_path) as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.get("base_config", [])
    if not isinstance(bases, list):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        if base.startswith("."):
            base = os.path.normpath(os.path.join(os.path.dirname(config_path), base))
        if os.path.normpath(base) not in _seen:
            _deep_merge(merged, load_config_cascade(base, _seen))
    _deep_merge(merged, cfg)
    return merged


def _coerce(node: dict, key: str, raw: str):
    """Coerce a CLI-override string to the type already present in the config."""
    raw = raw.strip("'\" ")
    current = node.get(key)
    if raw in ("True", "False") or isinstance(current, (bool, list, dict)):
        if isinstance(current, list):
            raw = raw.replace(" ", ",")
        return ast.literal_eval(raw)
    if current is None:
        # New key: best-effort literal parse, else keep the string.
        try:
            return ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            return raw
    return type(current)(raw)


def apply_overrides(cfg: dict, hparams_str: str) -> None:
    """Apply ``"a=1,b.c=2"``-style dotted overrides to ``cfg`` in place."""
    if not hparams_str:
        return
    for assignment in hparams_str.split(","):
        if not assignment.strip():
            continue
        key, val = assignment.split("=", 1)
        node = cfg
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _coerce(node, parts[-1], val)


def set_hparams(config="", exp_name="", hparams_str="", print_hparams=True,
                global_hparams=True, args=None) -> dict:
    """Build the merged hparams dict from config file + saved config + CLI."""
    if args is None:
        if config == "" and exp_name == "":
            parser = argparse.ArgumentParser(description="fastdiff_tpu")
            parser.add_argument("--config", type=str, default="")
            parser.add_argument("--exp_name", type=str, default="")
            parser.add_argument("--hparams", type=str, default="")
            parser.add_argument("--infer", action="store_true")
            parser.add_argument("--validate", action="store_true")
            parser.add_argument("--reset", action="store_true")
            parser.add_argument("--remove", action="store_true")
            parser.add_argument("--debug", action="store_true")
            args, _ = parser.parse_known_args()
        else:
            args = argparse.Namespace(
                config=config, exp_name=exp_name, hparams=hparams_str,
                infer=False, validate=False, reset=False, remove=False,
                debug=False)
    if args.config == "" and args.exp_name == "":
        raise ValueError("must provide --config or --exp_name")

    work_dir = ""
    saved = {}
    saved_config_path = ""
    if args.exp_name:
        work_dir = os.path.join("checkpoints", args.exp_name)
        saved_config_path = os.path.join(work_dir, "config.yaml")
        if os.path.exists(saved_config_path):
            with open(saved_config_path) as f:
                saved = yaml.safe_load(f) or {}

    cfg: dict = {}
    if args.config:
        _deep_merge(cfg, load_config_cascade(args.config))
    if not args.reset:
        _deep_merge(cfg, saved)
    cfg["work_dir"] = work_dir

    apply_overrides(cfg, args.hparams)

    if work_dir and getattr(args, "remove", False):
        answer = input("REMOVE old checkpoint? Y/N [Default: N]: ")
        if answer.lower() == "y":
            shutil.rmtree(work_dir, ignore_errors=True)

    if work_dir and (not os.path.exists(saved_config_path) or args.reset) \
            and not args.infer:
        os.makedirs(work_dir, exist_ok=True)
        with open(saved_config_path, "w") as f:
            yaml.safe_dump(cfg, f)

    cfg["infer"] = args.infer
    cfg["debug"] = args.debug
    cfg["validate"] = args.validate
    cfg["exp_name"] = args.exp_name

    global _printed_once
    if global_hparams:
        hparams.clear()
        hparams.update(cfg)
    if print_hparams and not _printed_once and global_hparams:
        print("| Hparams: ")
        for i, (k, v) in enumerate(sorted(cfg.items())):
            print(f"{k}: {v}, ", end="\n" if i % 5 == 4 else "")
        print("")
        _printed_once = True
    return cfg
