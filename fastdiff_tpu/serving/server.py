"""Minimal production vocoder server: HTTP mel-in / wav-out.

TPU-native serving front door over the vocoder registry. Requests carry a
mel spectrogram as an ``.npy`` body (shape (T, n_mels) or (n_mels, T),
float32); the response is a 16-bit PCM WAV. One chip, one compiled
sampler: vocode requests are SERIALIZED and run back-to-back at per-device
batch 1 — which measures FASTER in aggregate than on-chip batching at
these shapes (docs/PERF.md "single-chip batching anti-scales"); scale-out
is one server per chip behind any ordinary load balancer.

Concurrency/backpressure model: connections are handled on threads
(``ThreadingHTTPServer``) so health/metrics probes answer during a long
vocode, but at most ``max_queue`` vocode requests may be waiting on the
chip at once — beyond that the server answers 503 + ``Retry-After``
immediately instead of building an unbounded queue of TCP backlog clients.

    python -m fastdiff_tpu.serving.server \
        --config fastdiff_tpu/configs/ljspeech.yaml \
        --exp_name my_exp [--port 8300] [--hparams 'N=4']

Endpoints:
    POST /vocode       body: .npy mel -> audio/wav (503 while cold or full)
    GET  /healthz      200 once the model is warm (used by orchestrators)
    GET  /metrics      JSON: request counts, queue depth, RTF, audio seconds

The reference has no serving story at all (inference is the batch
``--infer`` CLI, reference: tasks/run.py + FastDiff.py:60-119); this is a
TPU-native addition built on the same sampler path the CLI uses.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class VocoderService:
    """Wraps a registry vocoder; warms the compile cache on first use.

    ``max_queue`` bounds how many vocode requests may be queued on the
    chip lock; an over-limit request raises ``Busy`` (mapped to 503).
    """

    class Busy(RuntimeError):
        pass

    def __init__(self, hparams: dict, max_queue: int = 4):
        from fastdiff_tpu.vocoders.base import get_vocoder_cls
        self.hparams = hparams
        self.sample_rate = int(hparams.get("audio_sample_rate", 22050))
        self.num_mels = int(hparams.get("audio_num_mel_bins", 80))
        self.vocoder = get_vocoder_cls(hparams)(hparams)
        self.max_queue = max_queue
        self._lock = threading.Lock()
        self._depth_lock = threading.Lock()
        self.queue_depth = 0
        self.warm = False
        # metrics
        self.requests_ok = 0
        self.requests_rejected = 0
        self.requests_failed = 0
        self.gen_seconds = 0.0
        self.audio_seconds = 0.0

    def warmup(self, frames: int = 128):
        mel = np.zeros((frames, self.num_mels), np.float32)
        self._vocode_locked(mel)
        self.warm = True

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        with self._depth_lock:
            if self.queue_depth >= self.max_queue:
                self.requests_rejected += 1
                raise self.Busy(
                    f"queue full ({self.queue_depth}/{self.max_queue})")
            self.queue_depth += 1
        try:
            return self._vocode_locked(mel)
        finally:
            with self._depth_lock:
                self.queue_depth -= 1

    def _vocode_locked(self, mel: np.ndarray) -> np.ndarray:
        if mel.ndim != 2:
            raise ValueError(f"mel must be 2-D, got {mel.shape}")
        if mel.shape[1] != self.num_mels and mel.shape[0] == self.num_mels:
            mel = mel.T                       # accept (n_mels, T) too
        if mel.shape[1] != self.num_mels:
            raise ValueError(f"expected {self.num_mels} mel bins, "
                             f"got shape {mel.shape}")
        with self._lock:                      # one chip: serialize requests
            t0 = time.perf_counter()
            wav = np.asarray(self.vocoder.spec2wav(mel.astype(np.float32)))
            self.gen_seconds += time.perf_counter() - t0
            self.audio_seconds += len(wav) / self.sample_rate
            return wav

    def metrics(self) -> dict:
        gen = self.gen_seconds
        return {
            "warm": self.warm,
            "queue_depth": self.queue_depth,
            "max_queue": self.max_queue,
            "requests_ok": self.requests_ok,
            "requests_rejected": self.requests_rejected,
            "requests_failed": self.requests_failed,
            "audio_seconds": round(self.audio_seconds, 3),
            "gen_seconds": round(gen, 3),
            "x_realtime": round(self.audio_seconds / gen, 2) if gen else None,
        }


def _wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    from fastdiff_tpu.utils.audio_io import save_wav
    buf = io.BytesIO()
    save_wav(wav, buf, sample_rate)
    return buf.getvalue()


def make_handler(service: VocoderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet default stderr spam
            pass

        def _send(self, code: int, body: bytes, ctype: str,
                  headers: dict | None = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for key, val in (headers or {}).items():
                self.send_header(key, val)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj, headers: dict | None = None):
            self._send(code, json.dumps(obj).encode(), "application/json",
                       headers)

        def do_GET(self):
            if self.path == "/healthz":
                code = 200 if service.warm else 503
                self._send_json(code, {"warm": service.warm})
            elif self.path == "/metrics":
                self._send_json(200, service.metrics())
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/vocode":
                self._send(404, b"not found", "text/plain")
                return
            if not service.warm:
                self._send_json(503, {"error": "not warm"},
                                {"Retry-After": "10"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                mel = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                wav = service.vocode(mel)
                service.requests_ok += 1
                self._send(200, _wav_bytes(wav, service.sample_rate),
                           "audio/wav")
            except service.Busy as e:        # backpressure, not an error
                self._send_json(503, {"error": str(e)}, {"Retry-After": "5"})
            except Exception as e:           # report, never crash the server
                service.requests_failed += 1
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(hparams: dict, port: int = 8300, warmup_frames: int = 128,
          max_queue: int = 4):
    service = VocoderService(hparams, max_queue=max_queue)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    # serve_forever starts BEFORE warmup so /healthz answers (warm=false ->
    # 503) during the ~30 s cold compile instead of hanging in the accept
    # backlog; /vocode answers 503 "not warm" until warmup completes.
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    print(f"| vocoder server on :{port} (vocoder="
          f"{hparams.get('vocoder', 'fastdiff')}); warming up...")
    service.warmup(warmup_frames)
    print("| warm; serving.")
    thread.join()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--exp_name", type=str, default="")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--port", type=int, default=8300)
    parser.add_argument("--max_queue", type=int, default=4)
    args = parser.parse_args()
    from fastdiff_tpu.utils.hparams import set_hparams
    hp = set_hparams(config=args.config, exp_name=args.exp_name,
                     hparams_str=args.hparams)
    serve(hp, port=args.port, max_queue=args.max_queue)


if __name__ == "__main__":
    main()
