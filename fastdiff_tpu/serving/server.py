"""Minimal production vocoder server: HTTP mel-in / wav-out.

TPU-native serving front door over the vocoder registry. Requests carry a
mel spectrogram as an ``.npy`` body (shape (T, n_mels) or (n_mels, T),
float32); the response is a 16-bit PCM WAV. Single-threaded by design:
one chip, one compiled sampler, requests run back-to-back at per-device
batch 1 — which measures FASTER in aggregate than on-chip batching at
these shapes (docs/PERF.md "single-chip batching anti-scales"); scale-out
is one server per chip behind any ordinary load balancer.

    python -m fastdiff_tpu.serving.server \
        --config fastdiff_tpu/configs/ljspeech.yaml \
        --exp_name my_exp [--port 8300] [--hparams 'N=4']

Endpoints:
    POST /vocode       body: .npy mel -> audio/wav
    GET  /healthz      200 once the model is warm (used by orchestrators)

The reference has no serving story at all (inference is the batch
``--infer`` CLI, reference: tasks/run.py + FastDiff.py:60-119); this is a
TPU-native addition built on the same sampler path the CLI uses.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


class VocoderService:
    """Wraps a registry vocoder; warms the compile cache on first use."""

    def __init__(self, hparams: dict):
        from fastdiff_tpu.vocoders.base import get_vocoder_cls
        self.hparams = hparams
        self.sample_rate = int(hparams.get("audio_sample_rate", 22050))
        self.num_mels = int(hparams.get("audio_num_mel_bins", 80))
        self.vocoder = get_vocoder_cls(hparams)(hparams)
        self._lock = threading.Lock()
        self.warm = False

    def warmup(self, frames: int = 128):
        mel = np.zeros((frames, self.num_mels), np.float32)
        self.vocode(mel)
        self.warm = True

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        if mel.ndim != 2:
            raise ValueError(f"mel must be 2-D, got {mel.shape}")
        if mel.shape[1] != self.num_mels and mel.shape[0] == self.num_mels:
            mel = mel.T                       # accept (n_mels, T) too
        if mel.shape[1] != self.num_mels:
            raise ValueError(f"expected {self.num_mels} mel bins, "
                             f"got shape {mel.shape}")
        with self._lock:                      # one chip: serialize requests
            return np.asarray(self.vocoder.spec2wav(mel.astype(np.float32)))


def _wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    from fastdiff_tpu.utils.audio_io import save_wav
    buf = io.BytesIO()
    save_wav(wav, buf, sample_rate)
    return buf.getvalue()


def make_handler(service: VocoderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet default stderr spam
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                code = 200 if service.warm else 503
                self._send(code, json.dumps(
                    {"warm": service.warm}).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/vocode":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                mel = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                wav = service.vocode(mel)
                self._send(200, _wav_bytes(wav, service.sample_rate),
                           "audio/wav")
            except Exception as e:           # report, never crash the server
                self._send(400, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")

    return Handler


def serve(hparams: dict, port: int = 8300, warmup_frames: int = 128):
    service = VocoderService(hparams)
    httpd = HTTPServer(("0.0.0.0", port), make_handler(service))
    print(f"| vocoder server on :{port} (vocoder="
          f"{hparams.get('vocoder', 'fastdiff')}); warming up...")
    service.warmup(warmup_frames)
    print("| warm; serving.")
    httpd.serve_forever()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--exp_name", type=str, default="")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--port", type=int, default=8300)
    args = parser.parse_args()
    from fastdiff_tpu.utils.hparams import set_hparams
    hp = set_hparams(config=args.config, exp_name=args.exp_name,
                     hparams_str=args.hparams)
    serve(hp, port=args.port)


if __name__ == "__main__":
    main()
