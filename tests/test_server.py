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


def test_denoise_image_batch_per_sample_sigma_matches_single(server):
    d = server.denoiser
    rng = np.random.default_rng(5)
    imgs = rng.uniform(size=(3, 1, 16, 16)).astype(np.float32)
    sigmas = [15.0, 25.0, 35.0]
    batched = d.denoise_image_batch(imgs, sigmas)
    for i, s in enumerate(sigmas):
        single = d.denoise_image(imgs[i], sigma=s)
        np.testing.assert_allclose(batched[i], single, atol=1e-5)
    # sequence-of-2D input keeps the per-image layout
    flat = d.denoise_image_batch([imgs[0, 0], imgs[1, 0]], [15.0, 25.0])
    assert flat.shape == (2, 16, 16)
    np.testing.assert_allclose(flat[0], batched[0, 0], atol=1e-5)
    with pytest.raises(ValueError):
        d.denoise_image_batch(imgs, [15.0, 25.0])  # wrong sigma count


def test_concurrent_requests_coalesce_correctly(server):
    """N concurrent single-image requests with DIFFERENT sigmas return each
    caller its own result (the coalescer groups them into shared batched
    forwards; correctness must not depend on grouping)."""
    import threading

    rng = np.random.default_rng(6)
    imgs = [rng.uniform(size=(16, 16)).astype(np.float32) for _ in range(6)]
    sigmas = [10.0, 15.0, 20.0, 25.0, 30.0, 35.0]
    singles = [server.denoiser.denoise_image(im, sigma=s)
               for im, s in zip(imgs, sigmas)]
    outs = [None] * 6
    errs = []

    def call(i):
        try:
            outs[i] = _post(server, "/v1/denoise_image", imgs[i],
                            sigma=sigmas[i])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    for i in range(6):
        np.testing.assert_allclose(outs[i], singles[i], atol=1e-5)


def test_coalescer_mixed_shapes_no_deadlock(server):
    """Different-shape concurrent requests fall into separate batches; the
    re-queued leftovers must still be served."""
    import threading

    rng = np.random.default_rng(7)
    shapes = [(16, 16), (16, 16), (32, 32), (16, 16), (32, 32)]
    imgs = [rng.uniform(size=s).astype(np.float32) for s in shapes]
    outs = [None] * len(shapes)

    def call(i):
        outs[i] = _post(server, "/v1/denoise_image", imgs[i], sigma=25)

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(shapes))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, s in enumerate(shapes):
        assert outs[i] is not None and outs[i].shape == s


def test_metrics_endpoint(server):
    x = np.random.default_rng(8).uniform(size=(16, 16)).astype(np.float32)
    _post(server, "/v1/denoise_image", x, sigma=25)
    status, body = _get(server, "/metrics")
    m = json.loads(body)
    assert status == 200
    assert m["requests"].get("/v1/denoise_image", 0) >= 1
    lat = m["latency_s"]["/v1/denoise_image"]
    assert lat["count"] >= 1 and lat["mean"] > 0
    # the coalescer records every dispatch's batch size
    assert sum(int(v) for v in m["coalesced_batch_sizes"].values()) >= 1


def test_npy_helpers_reject_pickle():
    # object arrays require pickle; the parser must refuse, not execute
    buf = io.BytesIO()
    np.save(buf, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(Exception):
        _parse_npy(buf.getvalue())
