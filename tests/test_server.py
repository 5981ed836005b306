"""HTTP serving daemon (cdlnet_tpu/server.py): .npy round-trips, blind
sigma, error paths, /info — against a live in-process server on CPU."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from cdlnet_tpu.models import CDLNet
from cdlnet_tpu.serve import Denoiser
from cdlnet_tpu.server import DenoiseServer, _dump_npy, _parse_npy


@pytest.fixture(scope="module")
def server():
    model = CDLNet(K=2, M=6, P=5, s=2, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=True)
    srv = DenoiseServer(Denoiser(model, params, bucket=16), port=0).start()
    yield srv
    srv.stop()


def _post(srv, path, arr, **params):
    q = "&".join(f"{k}={v}" for k, v in params.items())
    url = f"http://127.0.0.1:{srv.port}{path}" + (f"?{q}" if q else "")
    req = urllib.request.Request(
        url, data=_dump_npy(arr),
        headers={"Content-Type": "application/x-npy"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return np.load(io.BytesIO(r.read()), allow_pickle=False)


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=30
    ) as r:
        return r.status, r.read()


def test_healthz_and_info(server):
    status, body = _get(server, "/healthz")
    assert status == 200 and body == b"ok"
    status, body = _get(server, "/info")
    info = json.loads(body)
    assert status == 200
    assert info["model"] == "CDLNet"
    assert info["config"]["K"] == 2
    assert info["n_params"] > 0


def test_denoise_image_roundtrip(server):
    rng = np.random.default_rng(0)
    clean = np.clip(0.5 + 0.2 * rng.standard_normal((16, 16)), 0, 1)
    noisy = np.clip(clean + (25 / 255) * rng.standard_normal((16, 16)), 0, 1)
    out = _post(server, "/v1/denoise_image", noisy.astype(np.float32),
                sigma=25)
    assert out.shape == (16, 16) and out.dtype == np.float32
    assert np.all(np.isfinite(out))
    # blind path (MAD sigma estimate) also serves
    out_blind = _post(server, "/v1/denoise_image", noisy.astype(np.float32))
    assert out_blind.shape == (16, 16) and np.all(np.isfinite(out_blind))


def test_denoise_image_batched(server):
    x = np.random.default_rng(1).uniform(size=(2, 1, 16, 16)).astype(np.float32)
    out = _post(server, "/v1/denoise_image", x, sigma=20)
    assert out.shape == (2, 1, 16, 16)


def test_bad_requests(server):
    url = f"http://127.0.0.1:{server.port}/v1/denoise_image?sigma=25"
    # not an .npy body
    req = urllib.request.Request(url, data=b"junk", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())
    # wrong rank
    req = urllib.request.Request(
        url, data=_dump_npy(np.zeros((2, 1, 1, 16, 16), np.float32)),
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # unknown route
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/nope",
        data=_dump_npy(np.zeros((4, 4), np.float32)), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404


def test_denoise_video_endpoint():
    from cdlnet_tpu.models import CDLNetVideo

    model = CDLNetVideo(K=2, M=6, P=(5, 5, 3), s=2, adaptive=True, depth=8)
    params = model.init(jax.random.PRNGKey(0), init=True)
    srv = DenoiseServer(Denoiser(model, params, bucket=16), port=0).start()
    try:
        clip = np.random.default_rng(2).uniform(
            size=(8, 16, 16)).astype(np.float32)
        out = _post(srv, "/v1/denoise_video", clip, sigma=25)
        assert out.shape == (8, 16, 16) and np.all(np.isfinite(out))
        # streamed long-video path (overlap-discard chunks)
        clip16 = np.random.default_rng(3).uniform(
            size=(16, 16, 16)).astype(np.float32)
        out = _post(srv, "/v1/denoise_video", clip16, sigma=25,
                    chunk_depth=8, overlap=2)
        assert out.shape == (16, 16, 16) and np.all(np.isfinite(out))
        # chunking constraint violations surface as 400s, not 500s
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/denoise_video"
            "?sigma=25&chunk_depth=8&overlap=4",
            data=_dump_npy(clip16), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
    finally:
        srv.stop()


def test_npy_helpers_reject_pickle():
    # object arrays require pickle; the parser must refuse, not execute
    buf = io.BytesIO()
    np.save(buf, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(Exception):
        _parse_npy(buf.getvalue())
