"""BDDM noise-schedule search, end to end against a trained score network.

Validates the round-1 mechanism (diffusion/noise_predictor.py) as a
capability (VERDICT #4): train the phi noise predictor against a trained
FastDiff, run the reverse schedule search, and compare the discovered
schedules + their objective audio quality against the reference's published
BDDM-derived tables (reference: modules/FastDiff/task/FastDiff.py:76-93).

    python scripts/bddm_search.py --exp_name micro_lj \
        --config fastdiff_tpu/configs/micro_lj.yaml [--phi_steps 2000]

Writes a markdown report to docs/BDDM.md and the searched schedules to
<work_dir>/bddm_schedules.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PUBLISHED = {   # reference FastDiff.py:76-93 (BDDM-derived)
    8: [6.69e-06, 1.0e-05, 1.0e-05, 0.0001, 0.001, 0.01, 0.1, 0.35],
    6: [1.7838445955931093e-06, 2.7984189728158526e-05,
        0.00043231004383414984, 0.006634317338466644,
        0.09357017278671265, 0.6000000238418579],
    4: [3.2176e-4, 2.5743e-3, 2.5376e-2, 7.0414e-1],
    3: [9.0e-05, 9.0e-03, 6.0e-01],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="fastdiff_tpu/configs/micro_lj.yaml")
    ap.add_argument("--exp_name", default="micro_lj")
    ap.add_argument("--phi_steps", type=int, default=2000)
    ap.add_argument("--out", default="docs/BDDM.md")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import optax

    from fastdiff_tpu.config import AudioConfig
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.noise_predictor import (init_noise_predictor,
                                                        phi_loss,
                                                        search_noise_schedule)
    from fastdiff_tpu.diffusion.sampler import make_param_sampler
    from fastdiff_tpu.models.fastdiff import fuse_weight_norm
    from fastdiff_tpu.training.task import FastDiffTask
    from fastdiff_tpu.training.trainer import Trainer
    from fastdiff_tpu.utils import metrics
    from fastdiff_tpu.utils.hparams import set_hparams

    hp = set_hparams(config=args.config, exp_name=args.exp_name,
                     print_hparams=False)
    task = FastDiffTask(hp)
    trainer = Trainer(task, f"checkpoints/{args.exp_name}")
    state, step = trainer.restore(task.build_state())
    print(f"| score net restored at step {step}")
    params = fuse_weight_norm(state.get("ema", state["params"]))
    apply_fn = task.param_apply_fn()

    def denoise_fn(x, mel, t):
        return apply_fn(params, x, mel, t)

    # -- phi training --------------------------------------------------------
    phi = init_noise_predictor(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(phi)
    alpha = jnp.asarray(task.hyperparams.alpha)

    @jax.jit
    def phi_step(phi, opt_state, batch_mels, batch_wavs, key):
        def loss_fn(p):
            return phi_loss(p, denoise_fn, key, batch_mels, batch_wavs, alpha)
        loss, grads = jax.value_and_grad(loss_fn)(phi)
        updates, opt_state = opt.update(grads, opt_state, phi)
        return optax.apply_updates(phi, updates), opt_state, loss

    loader = task.train_dataloader()
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i, batch in enumerate(loader):
        if i >= args.phi_steps:
            break
        key, sub = jax.random.split(key)
        phi, opt_state, loss = phi_step(
            phi, opt_state, jnp.asarray(batch["mels"]),
            jnp.asarray(batch["wavs"]), sub)
        if i % 200 == 0:
            print(f"| phi step {i}: loss={float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)")

    # -- search + evaluate ---------------------------------------------------
    ds = task.val_dataloader()
    val_batch = next(iter(ds))
    mel = jnp.asarray(val_batch["mels"][:1])
    frames = mel.shape[1]
    audio_len = frames * task.model_cfg.total_hop
    gt = np.asarray(val_batch["wavs"])[0, :, 0]

    acfg = AudioConfig.from_hparams(hp)
    results = {}

    def eval_schedule(name, sched):
        const = schedules.sampler_constants_for_schedule(
            np.asarray(sched, np.float64), task.hyperparams)
        sampler = make_param_sampler(apply_fn, const)
        wav = np.asarray(sampler(params, jax.random.PRNGKey(7), mel,
                                 audio_len))[0, :, 0]
        return {
            "schedule": [float(b) for b in np.asarray(sched)],
            "mcd": metrics.mcd(wav, gt, acfg),
            "mrstft": metrics.multi_resolution_stft_distance(wav, gt),
            "pesq": metrics.pesq_mos(gt, wav, acfg.sample_rate),
        }

    for n in (8, 6, 4, 3):
        key, sub = jax.random.split(key)
        searched = search_noise_schedule(
            phi, denoise_fn, sub, mel, task.hyperparams, audio_len,
            max_steps=n, beta_start=PUBLISHED[n][-1],
            alpha_start=0.3, rho=1e-9)
        print(f"| N={n}: searched {len(searched)} steps: "
              f"{[f'{b:.2e}' for b in searched]}")
        if len(searched) == 0:
            continue
        results[n] = {
            "searched": eval_schedule(f"searched{n}", searched),
            "published": eval_schedule(f"published{n}", PUBLISHED[n]),
        }

    work_dir = f"checkpoints/{args.exp_name}"
    with open(os.path.join(work_dir, "bddm_schedules.json"), "w") as f:
        json.dump(results, f, indent=1)

    lines = [
        "# BDDM noise-schedule search (validated end to end)", "",
        f"Score net: `{args.exp_name}` at step {step} (EMA, weight-norm "
        "fused). Phi predictor trained " f"{args.phi_steps} steps on the "
        "same corpus (diffusion/noise_predictor.py; the reference's "
        "phi hooks are uncallable dead code, util.py:284,356).", "",
        "| N | schedule | MCD dB | MR-STFT | PESQ |",
        "|---|---|---|---|---|",
    ]
    for n, r in sorted(results.items()):
        s = r["searched"]
        p = r["published"]
        fmt = lambda xs: "[" + ", ".join(f"{x:.2e}" for x in xs) + "]"
        lines.append(f"| {n} (searched, {len(s['schedule'])} steps) | "
                     f"{fmt(s['schedule'])} | {s['mcd']:.2f} | "
                     f"{s['mrstft']:.3f} | {s['pesq']:.2f} |")
        lines.append(f"| {n} (published) | {fmt(p['schedule'])} | "
                     f"{p['mcd']:.2f} | {p['mrstft']:.3f} | {p['pesq']:.2f} |")
    lines += ["",
              "Published rows are the reference's BDDM-derived tables "
              "(FastDiff.py:76-93) run through the same sampler/metrics on "
              "the same held-out utterance."]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"| wrote {args.out}")


if __name__ == "__main__":
    main()
