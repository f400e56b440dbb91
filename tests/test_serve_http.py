"""HTTP inference server (gtax.cli.serve): health, generation, validation.

Runs the real ThreadingHTTPServer on an ephemeral port with the debug
presets + random weights and drives it through urllib — the same wire a
production client uses. The reference has no serving story at all."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gtax.cli.serve import build_parser, make_server


@pytest.fixture(scope="module")
def server_url():
    args = build_parser().parse_args([
        "--port", "0",  # ephemeral
        "--dit_model_path", "", "--vae_model_path", "",
        "--dit_model", "DiT-debug", "--vae_model", "vae-debug",
        "--dtype", "float32", "--attention_backend", "xla",
        "--quantize", "none", "--noise_steps", "2", "--max_frames", "8",
    ])
    server = make_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _b64_png(h=48, w=64):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    ).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, obj):
    req = urllib.request.Request(
        url + "/generate", json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        body = json.load(r)
    assert body["ok"] and body["model"] == "DiT-debug"


def test_generate_returns_mp4(server_url):
    with _post(server_url, {"image": _b64_png(), "num_frames": 4,
                            "seed": 7}) as r:
        assert r.headers["Content-Type"] == "video/mp4"
        assert r.headers["X-Seed"] == "7"
        data = r.read()
    assert len(data) > 0 and data[4:8] == b"ftyp"  # mp4 container magic


def test_generate_validates(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"image": _b64_png(), "num_frames": 999})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"num_frames": 4})  # no image
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"image": _b64_png(), "num_frames": 4,
                           "actions": [[0.0] * 25] * 2})  # too short
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url, {"image": _b64_png(), "num_frames": 4,
                           "seed": "abc"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server_url + "/nope", timeout=30)
    assert e.value.code == 404
