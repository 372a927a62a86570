"""HTTP vocoder server: mel .npy in -> WAV out, health endpoint, errors."""

import http.client
import io
import threading
from http.server import HTTPServer

import numpy as np
import pytest

from fastdiff_tpu.serving.server import (VocoderService, _wav_bytes,
                                         make_handler)

HP = {"vocoder": "glmel", "audio_sample_rate": 22050,
      "audio_num_mel_bins": 80, "hop_size": 256, "fft_size": 1024,
      "win_size": 1024, "fmin": 80, "fmax": 7600,
      "griffin_lim_iters": 4}


@pytest.fixture(scope="module")
def server():
    service = VocoderService(dict(HP))
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    service.warmup(frames=8)
    yield httpd.server_address[1]
    httpd.shutdown()


def _post_npy(port, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/vocode", body=buf.getvalue())
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), body


def test_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    assert b'"warm": true' in resp.read()
    conn.close()


def test_vocode_roundtrip(server):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((16, 80)).astype(np.float32) - 4.0
    status, ctype, body = _post_npy(server, mel)
    assert status == 200 and ctype == "audio/wav"
    from scipy.io import wavfile
    sr, wav = wavfile.read(io.BytesIO(body))
    assert sr == 22050
    assert wav.shape[0] == 16 * 256
    # channels-first mels are accepted too
    status2, _, body2 = _post_npy(server, mel.T)
    assert status2 == 200 and len(body2) == len(body)


def test_vocode_bad_input(server):
    status, ctype, body = _post_npy(
        server, np.zeros((3, 3, 3), np.float32))
    assert status == 400 and b"error" in body
    status, _, _ = _post_npy(server, np.zeros((5, 17), np.float32))
    assert status == 400


def test_wav_bytes_is_valid_wav():
    from scipy.io import wavfile
    wav = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    sr, decoded = wavfile.read(io.BytesIO(_wav_bytes(wav, 8000)))
    assert sr == 8000 and decoded.shape == (1000,)
