"""End-to-end learning sanity on real hardware: binarize synthetic tones ->
train 2500 steps -> vocode test split -> spectral metrics vs ground truth.

Last validated on a TPU v5e chip: val loss 1.0 -> 0.136 by 2500 steps,
test-split MCD ~14.7 dB / mel-L2 ~4.7 (plateaus on this tiny synthetic set;
the point is the pipeline demonstrably learns and the full CLI inference
path reproduces it).

    python scripts/e2e_sanity.py [workdir]
"""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fastdiff_e2e_sanity"
os.makedirs(f"{root}/raw", exist_ok=True)
from fastdiff_tpu.utils import audio_io
sr = 22050
rng = np.random.default_rng(0)
with open(f"{root}/metadata_phone.csv", "w") as f:
    f.write("item_name,wav_fn\n")
    for i in range(24):
        t = np.arange(int(sr*1.5))/sr
        f1, f2 = 150 + 20*i, 300 + 35*i
        am = 0.5 + 0.3*np.sin(2*np.pi*2.0*t + i)
        wav = (am*(0.45*np.sin(2*np.pi*f1*t) + 0.25*np.sin(2*np.pi*f2*t))
               + 0.01*rng.standard_normal(len(t))).astype(np.float32)
        fn = f"{root}/raw/u{i:02d}.wav"
        audio_io.save_wav(wav, fn, sr)
        f.write(f"u{i:02d},{fn}\n")

hp = {
    "processed_data_dir": root, "binary_data_dir": f"{root}/binary",
    "work_dir": f"{root}/work",
    "audio_sample_rate": sr, "audio_num_mel_bins": 80,
    "fft_size": 1024, "hop_size": 256, "win_size": 1024,
    "fmin": 80, "fmax": 7600, "test_num": 4,
    "audio_channels": 1, "inner_channels": 32, "cond_channels": 80,
    "upsample_ratios": [8, 8, 4], "lvc_layers_each_block": 4,
    "lvc_kernel_size": 3, "kpnet_hidden_channels": 64, "kpnet_conv_size": 3,
    "dropout": 0.0, "diffusion_step_embed_dim_in": 128,
    "diffusion_step_embed_dim_mid": 512, "diffusion_step_embed_dim_out": 512,
    "use_weight_norm": True, "compute_dtype": "bfloat16", "conv_impl": "dot",
    "T": 1000, "beta_0": 1e-6, "beta_T": 0.01, "noise_schedule": "", "N": 4,
    "max_updates": 2500, "max_samples": 12800, "max_sentences": 16,
    "max_valid_sentences": 2, "val_check_interval": 1250,
    "num_sanity_val_steps": 1, "tb_log_interval": 250,
    "lr": 4e-4, "weight_decay": 0, "scheduler": "none",
    "optimizer_adam_beta1": 0.9, "optimizer_adam_beta2": 0.98,
    "clip_grad_norm": 1, "accumulate_grad_batches": 1,
    "num_ckpt_keep": 1, "save_best": True, "seed": 0,
    "valid_monitor_key": "val_loss", "valid_monitor_mode": "min",
    "endless_ds": True, "eval_max_batches": 2, "amp": True,
    "binarization_args": {"with_wav": True, "shuffle": False},
    "pre_align_args": {}, "N_PROC": 1,
    "test_input_dir": "", "test_mel_dir": "", "use_wav": True,
    "save_gt": True, "gen_dir_name": "", "resume_from_checkpoint": 0,
    "load_ckpt": "",
    "binarizer_cls": "fastdiff_tpu.data.binarizer.VocoderBinarizer",
    "train_set_name": "train", "valid_set_name": "valid", "test_set_name": "test",
}

from fastdiff_tpu.data.binarizer import VocoderBinarizer
VocoderBinarizer(hp).process()

from fastdiff_tpu.training.task import FastDiffTask
from fastdiff_tpu.training.trainer import Trainer
task = FastDiffTask(hp)
trainer = Trainer(task, hp["work_dir"])
t0 = time.time()
result = trainer.fit()
print(f"training done in {(time.time()-t0)/60:.1f} min, val={result['val']}", flush=True)

results = trainer.test()
gen_dir = max(glob.glob(f"{hp['work_dir']}/generated_*"),
              key=lambda d: int(d.split("generated_")[1].split("_")[0]))
from fastdiff_tpu.utils import metrics
from fastdiff_tpu.config import AudioConfig
cfg = AudioConfig()
mcds, msds = [], []
for pred_fn in glob.glob(f"{gen_dir}/*_pred.wav"):
    gt_fn = pred_fn.replace("_pred", "_gt")
    pred, _ = audio_io.load_wav(pred_fn)
    gt, _ = audio_io.load_wav(gt_fn)
    mcds.append(metrics.mcd(pred, gt, cfg))
    msds.append(metrics.mel_spectral_distance(pred, gt, cfg))
print(f"test-split quality after 2500 steps: MCD {np.mean(mcds):.2f} dB, "
      f"mel-L2 {np.mean(msds):.2f}", flush=True)
