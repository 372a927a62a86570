"""Frozen, hashable config views for use inside jitted code.

The reference threads a global mutable ``hparams`` dict through model code
(reference: utils/hparams.py:8, modules/FastDiff/task/FastDiff.py:17-29).
Under JAX that is a tracing hazard, so the host-side dict is converted once
into immutable dataclasses; everything under ``jax.jit`` closes over these
static values and XLA sees fully static shapes/constants.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """FastDiff denoiser hyperparameters (reference: FastDiff_model.py:13-26)."""
    audio_channels: int = 1
    inner_channels: int = 32
    cond_channels: int = 80
    upsample_ratios: Tuple[int, ...] = (8, 8, 4)
    lvc_layers_each_block: int = 4
    lvc_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    dropout: float = 0.0
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    use_weight_norm: bool = True
    use_pallas_block: object = False  # False | True (r2 NWC kernel) | "ncl"
    use_pallas_down: bool = False   # fused down-path kernel (TPU only)
    compute_dtype: str = "bfloat16"
    conv_impl: str = "dot"          # "dot" (shifted matmuls; 2x faster
                                    # on TPU) | "lax" (conv_general_dilated)

    @property
    def cond_hop_lengths(self) -> Tuple[int, ...]:
        """Per-LVC-block conditioning hop = cumulative product of ratios."""
        hops = []
        hop = 1
        for r in self.upsample_ratios:
            hop *= r
            hops.append(hop)
        return tuple(hops)

    @property
    def total_hop(self) -> int:
        hop = 1
        for r in self.upsample_ratios:
            hop *= r
        return hop

    @classmethod
    def from_hparams(cls, hp: dict) -> "ModelConfig":
        return cls(
            audio_channels=int(hp.get("audio_channels", 1)),
            inner_channels=int(hp.get("inner_channels", 32)),
            cond_channels=int(hp.get("cond_channels", 80)),
            upsample_ratios=tuple(hp.get("upsample_ratios", (8, 8, 4))),
            lvc_layers_each_block=int(hp.get("lvc_layers_each_block", 4)),
            lvc_kernel_size=int(hp.get("lvc_kernel_size", 3)),
            kpnet_hidden_channels=int(hp.get("kpnet_hidden_channels", 64)),
            kpnet_conv_size=int(hp.get("kpnet_conv_size", 3)),
            dropout=float(hp.get("dropout", 0.0)),
            diffusion_step_embed_dim_in=int(hp.get("diffusion_step_embed_dim_in", 128)),
            diffusion_step_embed_dim_mid=int(hp.get("diffusion_step_embed_dim_mid", 512)),
            diffusion_step_embed_dim_out=int(hp.get("diffusion_step_embed_dim_out", 512)),
            use_weight_norm=bool(hp.get("use_weight_norm", True)),
            # 'ncl'/'ncl_fh' resolve at the *inference* entry points (see
            # resolve_pallas_block / inference_model_config); the training
            # config admits the trainable kernel routes: True (the r2
            # NWC kernel, recompute VJP), "ncl_vjp" (NCL megakernel,
            # recompute VJP), "ncl_sr" (NCL megakernel, saved-residual
            # VJP — no forward recompute in the backward), and "auto",
            # which resolves backend-aware in resolve_train_block below.
            use_pallas_block=resolve_train_block(hp),
            use_pallas_down=(hp.get("use_pallas_down", False) is True),
            compute_dtype=str(hp.get("compute_dtype", "bfloat16")),
            conv_impl=str(hp.get("conv_impl", "dot")),
        )


def resolve_pallas_block(hp: dict):
    """Inference-time policy for the whole-block fused kernels.

    Returns False (XLA path), True (legacy round-2 NWC megakernel,
    ops/lvc_block_pallas) or "ncl" (round-3 time-in-lanes megakernel,
    ops/lvc_block_ncl).

    ``use_pallas_block: auto`` (the config default) resolves to **"ncl"
    on TPU**: hardware-trace A/B at the bench shapes (round 3,
    docs/PERF.md) measures the NCL kernel 5.1x faster than the XLA inner
    loop on the hop-256 block (1.62 -> 0.32 ms) and 4.4x on hop-64
    (0.52 -> 0.12 ms); the round-2 NWC kernel remains slower than XLA
    (its in-kernel (E, 32) tensors are lane-padded 4x) and is kept only
    for A/B. On CPU/GPU auto resolves to the XLA path (the kernel would
    only run in Mosaic interpret mode there). Explicit true/false/ncl
    wins. Training resolves separately via resolve_train_block (auto ->
    "ncl_vjp" on TPU since the r5 route bench).
    """
    raw = hp.get("use_pallas_block", "auto")
    if isinstance(raw, str):
        low = raw.strip().lower()
        if low in ("ncl", "ncl_fh"):
            return low
        if low in ("ncl_sr", "ncl_vjp"):
            # trainable-route strings: inference uses the plain megakernel
            return "ncl"
        if low in ("auto", ""):
            # backend-aware: the NCL megakernel targets the TPU; on CPU the
            # kernel would run in Mosaic interpret mode (orders of magnitude
            # slower than the XLA path). Explicit "ncl" still forces it
            # anywhere (tests exercise the interpret path that way).
            import jax
            return "ncl" if jax.default_backend() not in ("cpu", "gpu") \
                else False
        return low in ("1", "true", "yes", "on")
    return bool(raw)


def resolve_train_block(hp: dict):
    """Training-time policy for the LVC-block implementation.

    Returns False (XLA shifted-matmul path), True (r2 NWC megakernel,
    recompute VJP), "ncl_vjp" (NCL megakernel forward + recompute VJP)
    or "ncl_sr" (NCL megakernel + saved-residual VJP).

    ``use_pallas_block: auto`` (the config default) resolves to
    **"ncl_vjp" on TPU**: the r5 four-route slope-timed bench of the full
    jitted train step at the reference recipe (batch 20 x 25600,
    scripts/bench_trainstep.py) measures ncl_vjp 28.4 ms/step vs
    xla 50.0, ncl_sr 42.6, nwc_vjp 125.1, with loss parity to 2e-5
    (docs/PERF.md). On CPU/GPU auto resolves to the XLA path (the
    kernel would only run in Mosaic interpret mode there). Explicit
    values win. Reference trains this module via torch autograd
    (modules/FastDiff/task/FastDiff.py); the route concept is ours."""
    raw = hp.get("use_pallas_block", "auto")
    if raw is True:
        return True
    if isinstance(raw, str):
        low = raw.strip().lower()
        if low in ("ncl_vjp", "ncl_sr"):
            return low
        if low in ("auto", ""):
            import jax
            return ("ncl_vjp"
                    if jax.default_backend() not in ("cpu", "gpu")
                    else False)
        if low in ("1", "true", "yes", "on"):
            return True
    return False


def resolve_pallas_down(hp: dict) -> bool:
    """Inference-time policy for the fused down-path kernel.

    ``use_pallas_down: auto`` (the default) currently means OFF: under
    slope timing the shifted-matmul XLA down path runs 0.44 ms/call at the
    bench shape while the fused kernel runs 1.56 ms — the path's full-rate
    stage carries (E, 1) audio and (E, k0+1) tap operands that Mosaic
    lane-pads to 128, so every VPU pass costs 128x its logical bytes
    (docs/PERF.md). Explicit true/false wins; the kernel stays one flag
    away. Training always uses the XLA path."""
    raw = hp.get("use_pallas_down", "auto")
    if isinstance(raw, str):
        if raw.strip().lower() in ("auto", ""):
            return False
        return raw.strip().lower() in ("1", "true", "yes", "on")
    return bool(raw)


def inference_model_config(cfg: "ModelConfig", hp: dict) -> "ModelConfig":
    """ModelConfig for inference entry points: Pallas kernels per policy."""
    return dataclasses.replace(cfg,
                               use_pallas_block=resolve_pallas_block(hp),
                               use_pallas_down=resolve_pallas_down(hp))


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Training diffusion schedule (reference: config/base.yaml:38-42)."""
    T: int = 1000
    beta_0: float = 1e-6
    beta_T: float = 0.01

    @classmethod
    def from_hparams(cls, hp: dict) -> "DiffusionConfig":
        return cls(T=int(hp.get("T", 1000)),
                   beta_0=float(hp.get("beta_0", 1e-6)),
                   beta_T=float(hp.get("beta_T", 0.01)))


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Mel front-end parameters (reference: config/base.yaml:4-16,
    data_gen/tts/data_gen_utils.py:93-147)."""
    sample_rate: int = 22050
    num_mels: int = 80
    fft_size: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 80.0
    fmax: float = 7600.0
    mel_eps: float = 1e-6
    mel_compression: str = "log10"   # "log10" (pwg) | "ln" (tacotron)
    griffin_lim_iters: int = 60

    @classmethod
    def from_hparams(cls, hp: dict) -> "AudioConfig":
        return cls(
            sample_rate=int(hp.get("audio_sample_rate", 22050)),
            num_mels=int(hp.get("audio_num_mel_bins", 80)),
            fft_size=int(hp.get("fft_size", 1024)),
            hop_size=int(hp.get("hop_size", 256)),
            win_size=int(hp.get("win_size", 1024)),
            fmin=float(hp.get("fmin", 80)),
            fmax=float(hp.get("fmax", 7600)),
            mel_eps=float(hp.get("mel_eps", 1e-6)),
            mel_compression=str(hp.get("mel_compression", "log10")),
            griffin_lim_iters=int(hp.get("griffin_lim_iters", 60)),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer knobs (reference: config/base.yaml:48-157)."""
    max_updates: int = 1000000
    max_samples: int = 25600
    max_sentences: int = 20
    max_valid_sentences: int = 1
    val_check_interval: int = 2000
    num_sanity_val_steps: int = 2
    lr: float = 2e-4
    weight_decay: float = 0.0
    scheduler: str = "none"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    clip_grad_norm: float = 1.0
    accumulate_grad_batches: int = 1
    tb_log_interval: int = 100
    num_ckpt_keep: int = 3
    save_best: bool = True
    valid_monitor_key: str = "val_loss"
    valid_monitor_mode: str = "min"
    seed: int = 1234
    amp: bool = True
    eval_max_batches: int = -1
    endless_ds: bool = True

    @classmethod
    def from_hparams(cls, hp: dict) -> "TrainConfig":
        max_sentences = int(hp.get("max_sentences", 20))
        max_valid = int(hp.get("max_valid_sentences", 1))
        if max_valid == -1:  # reference: -1 -> use the train batch size
            max_valid = max_sentences
        return cls(
            max_updates=int(hp.get("max_updates", 1000000)),
            max_samples=int(hp.get("max_samples", 25600)),
            max_sentences=max_sentences,
            max_valid_sentences=max_valid,
            val_check_interval=int(hp.get("val_check_interval", 2000)),
            num_sanity_val_steps=int(hp.get("num_sanity_val_steps", 2)),
            lr=float(hp.get("lr", 2e-4)),
            weight_decay=float(hp.get("weight_decay", 0.0)),
            scheduler=str(hp.get("scheduler", "none")),
            adam_beta1=float(hp.get("optimizer_adam_beta1", 0.9)),
            adam_beta2=float(hp.get("optimizer_adam_beta2", 0.98)),
            clip_grad_norm=float(hp.get("clip_grad_norm", 1.0)),
            accumulate_grad_batches=int(hp.get("accumulate_grad_batches", 1)),
            tb_log_interval=int(hp.get("tb_log_interval", 100)),
            num_ckpt_keep=int(hp.get("num_ckpt_keep", 3)),
            save_best=bool(hp.get("save_best", True)),
            valid_monitor_key=str(hp.get("valid_monitor_key", "val_loss")),
            valid_monitor_mode=str(hp.get("valid_monitor_mode", "min")),
            seed=int(hp.get("seed", 1234)),
            amp=bool(hp.get("amp", True)),
            eval_max_batches=int(hp.get("eval_max_batches", -1)),
            endless_ds=bool(hp.get("endless_ds", True)),
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (TPU-native; no reference analog)."""
    mesh_shape: Tuple[int, ...] = ()
    mesh_axes: Tuple[str, ...] = ("dp",)

    @classmethod
    def from_hparams(cls, hp: dict) -> "MeshConfig":
        return cls(mesh_shape=tuple(hp.get("mesh_shape", ()) or ()),
                   mesh_axes=tuple(hp.get("mesh_axes", ("dp",))))
