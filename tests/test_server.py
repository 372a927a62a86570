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
    from http.server import ThreadingHTTPServer
    service = VocoderService(dict(HP))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
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


def test_metrics_endpoint(server):
    import json
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    assert resp.status == 200
    m = json.loads(resp.read())
    conn.close()
    assert m["warm"] is True
    assert m["queue_depth"] == 0
    assert m["requests_ok"] >= 1            # earlier tests vocoded
    assert m["audio_seconds"] > 0 and m["gen_seconds"] > 0


def test_concurrent_clients_serialize_not_crash(server):
    """Several simultaneous vocode requests: all succeed (serialized on the
    chip lock), none drop, metrics count them."""
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((16, 80)).astype(np.float32) - 4.0
    results = []

    def hit():
        results.append(_post_npy(server, mel)[0])

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count(200) == 4


def test_backpressure_503_when_queue_full():
    """A service with max_queue=1 rejects the overlapping request with 503
    while a slow vocode holds the chip."""
    import json
    import time as _time

    service = VocoderService(dict(HP), max_queue=1)
    orig = service.vocoder.spec2wav
    service.vocoder.spec2wav = lambda mel: (_time.sleep(0.8), orig(mel))[1]
    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    service.warm = True
    port = httpd.server_address[1]
    mel = np.zeros((8, 80), np.float32)
    statuses = []

    def hit():
        statuses.append(_post_npy(port, mel))

    threads = [threading.Thread(target=hit) for _ in range(3)]
    for t in threads:
        t.start()
        _time.sleep(0.1)       # ensure the first is in flight
    for t in threads:
        t.join()
    httpd.shutdown()
    codes = sorted(s[0] for s in statuses)
    assert codes[0] == 200 and 503 in codes, codes
    rejected = [s for s in statuses if s[0] == 503]
    assert all(b"queue full" in s[2] for s in rejected)
    assert service.requests_rejected == codes.count(503)


def test_cold_vocode_rejected_with_503():
    service = VocoderService(dict(HP))
    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    port = httpd.server_address[1]
    status, _, body = _post_npy(port, np.zeros((8, 80), np.float32))
    httpd.shutdown()
    assert status == 503 and b"not warm" in body


def test_wav_bytes_is_valid_wav():
    from scipy.io import wavfile
    wav = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    sr, decoded = wavfile.read(io.BytesIO(_wav_bytes(wav, 8000)))
    assert sr == 8000 and decoded.shape == (1000,)
