"""Production inference wrapper: load once, compile per shape bucket,
denoise numpy images/videos.

Eval datasets mix image sizes (Set12 spans 256x256 to 512x512), and every
new shape costs an XLA compile — expensive over the first pass of a
dataset and unacceptable for a serving process. Denoiser reflect-pads each
input up to a shape bucket (multiples of `bucket` per spatial dim), runs
one cached jitted forward per bucket, and crops back. Reflect padding also
gives the denoiser better context at image borders than the zero padding
inside the convs, so bucketed outputs can differ slightly from the
unpadded forward near edges (standard overlap-save behavior).

Blind operation: sigma=None on an adaptive model estimates the noise level
with the MAD/PCA estimator (nle/) per input, like the analyzers' --blind.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _bucket(n: int, b: int) -> int:
    return -(-n // b) * b


def _xhat(out):
    """Unwrap a model.apply result: (xhat, z) or DnCNN-style ((xhat, n), state)."""
    x = out[0]
    return x[0] if isinstance(x, tuple) else x


class Denoiser:
    """Serving-oriented wrapper around a model + params.

    >>> d = Denoiser.from_args(json.load(open("args.json")))   # loads ckpt
    >>> out = d.denoise_image(img, sigma=25)                   # (H, W) [0,1]
    >>> out = d.denoise_image(img)                             # blind (MAD)
    >>> out = d.denoise_video(frames, sigma=25)                # (D, H, W)
    >>> d = Denoiser(model, params, mesh={"data": -1})         # multi-chip:
    ...     # batched inputs shard over all devices (throughput serving)
    """

    def __init__(self, model, params, bucket: int = 64, blind: str = "MAD",
                 mesh=None):
        from cdlnet_tpu.models.csr import CDLNetCSR, CDLNetCSRf2

        self.model = model
        self.params = params
        self.bucket = bucket
        self.blind = blind
        self._shard_batch = None
        self._is_csr = isinstance(model, (CDLNetCSR, CDLNetCSRf2))
        self._rec = None
        if self._is_csr:
            # frame-recurrent models: videos run the carried-code recurrence,
            # single frames run without neighbor context
            from cdlnet_tpu.models.csr import csr_video_denoise, csrf2_video_denoise

            self._rec = (
                csrf2_video_denoise
                if isinstance(model, CDLNetCSRf2)
                else csr_video_denoise
            )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            from cdlnet_tpu.dist.mesh import make_mesh
            from cdlnet_tpu.dist.sharding import replicate_sharding

            if isinstance(mesh, dict):
                mesh = make_mesh(mesh)
            self.params = jax.device_put(params, replicate_sharding(mesh))
            data_ax = "data" if "data" in mesh.shape else None
            ndata = mesh.shape.get("data", 1)
            ndepth = mesh.shape.get("depth", 1)
            s = getattr(model, "s", 1)

            def shard_batch(y):
                if y.shape[0] % ndata:
                    return y  # ragged batch: run unsharded (replicated)
                if y.ndim == 5 and ndepth > 1:
                    if y.shape[2] % (ndepth * s):
                        # ragged clip depth: data-shard only
                        return jax.device_put(
                            y, NamedSharding(mesh, PS(data_ax)))
                    return jax.device_put(
                        y,
                        NamedSharding(
                            mesh, PS(data_ax, None, "depth", None, None)),
                    )
                return jax.device_put(y, NamedSharding(mesh, PS(data_ax)))

            self._shard_batch = shard_batch
        self._mesh = mesh
        self._build_fwd()

    def _build_fwd(self):
        """(Re)build the jitted forward dispatch from self.model/_mesh.

        Called from __init__ and again from the _run OOM fallback after a
        backend demotion — rebuilding the SAME dispatch (CSR recurrence,
        mesh/shard_map routing) rather than a bare apply lambda, so CSR
        video serving and mesh serving survive the demotion."""
        model, rec, mesh = self.model, self._rec, self._mesh

        smf = smf_rec = None
        depth_fwd = None
        ndata = 1
        run_model = model  # what the plain (non-shard_map) forward runs
        if mesh is not None and getattr(model, "backend", None) == "pallas":
            # ANY multi-device jit refuses to compile a Mosaic kernel outside
            # shard_map — including the depth-only mesh's ragged-clip
            # fallthrough (depth_fwd -> None -> plain apply). The plain-path
            # model is therefore demoted whenever a mesh exists, not only on
            # data meshes; pallas still runs where it's wired (shard_map /
            # halo_fused routes below).
            import dataclasses

            run_model = dataclasses.replace(model, backend="xla")
        if (
            mesh is not None
            and mesh.shape.get("depth", 1) > 1
            and not self._is_csr
            and hasattr(model, "pad")  # LISTA-family 3D models
        ):
            # depth-sharded (sequence-parallel) video serving: clips shard
            # over the frame axis; per-shard compute runs the fused banded
            # kernels on halo-extended blocks when supported, else the XLA
            # halo forward (incl. residual-block variants). The route to
            # native-resolution clips whose codes exceed one chip's HBM.
            from cdlnet_tpu.core.pad import unpad_3d
            from cdlnet_tpu.core.preprocess import pre_process_3d
            from cdlnet_tpu.dist.halo import sharded_lista_3d_forward
            from cdlnet_tpu.dist.halo_fused import (
                fused_depth_shard_supported,
                sharded_lista_3d_fused_forward,
            )

            ndepth = mesh.shape["depth"]
            data_ax = "data" if "data" in mesh.shape else None

            def depth_fwd(p, y, sig):
                ypc, prm, _ = pre_process_3d(y, model.s)
                D, H, W = ypc.shape[2:]
                if y.shape[2] % (ndepth * model.s):
                    return None  # ragged clip depth: caller's plain path
                if fused_depth_shard_supported(model, D, H, W, ndepth):
                    xp, _ = sharded_lista_3d_fused_forward(
                        model, p, ypc, sig, mesh=mesh, batch_axis=data_ax)
                else:
                    xp, _ = sharded_lista_3d_forward(
                        model, p, ypc + prm[0], sig, mesh=mesh,
                        depth_axis="depth", batch_axis=data_ax)
                    return jax.lax.optimization_barrier(unpad_3d(xp, prm[1]))
                from cdlnet_tpu.core.preprocess import post_process_3d

                return post_process_3d(xp, prm)

        if mesh is not None and "data" in mesh.shape:
            # multi-chip serving: params replicated, inputs sharded on the
            # batch dim over the mesh's "data" axis. XLA-backend models are
            # partitioned by GSPMD from the shardings; backend="pallas"
            # models CANNOT be (jax refuses to compile a Mosaic kernel in a
            # multi-device jit: "Mosaic kernels cannot be automatically
            # partitioned. Please wrap the call in a shard_map.") — their
            # forward runs per-device inside shard_map instead, and ragged
            # batches fall back to a replicated XLA-backend forward.
            from cdlnet_tpu.dist.sharding import shard_map_forward

            ndata = mesh.shape["data"]
            if getattr(model, "backend", None) == "pallas":
                if self._is_csr:
                    smf = shard_map_forward(
                        mesh, lambda p, y, s, m: model.apply(p, y, sigma=s)[0]
                    )
                    smf_rec = shard_map_forward(
                        mesh, lambda p, y, s, m: rec(model, p, y, s)[0]
                    )
                else:
                    smf = shard_map_forward(
                        mesh,
                        lambda p, y, s, m: _xhat(
                            model.apply(p, y, s, return_z=False)
                        ),
                    )

        if self._is_csr:

            def fwd_impl(p, y, s):
                # trace-time dispatch: shapes are static under jit
                sharded = smf is not None and y.shape[0] % ndata == 0
                if y.ndim == 5:
                    if sharded:
                        return smf_rec(p, y, s)
                    return rec(run_model, p, y, s)[0]
                if sharded:
                    return smf(p, y, s)
                return run_model.apply(p, y, sigma=s)[0]

            self._fwd = jax.jit(fwd_impl)
        else:

            def fwd_impl(p, y, s):
                if depth_fwd is not None and y.ndim == 5:
                    out = depth_fwd(p, y, s)  # trace-time dispatch
                    if out is not None:
                        return out
                if smf is not None and y.shape[0] % ndata == 0:
                    return smf(p, y, s)
                return _xhat(run_model.apply(p, y, s, return_z=False))

            self._fwd = jax.jit(fwd_impl)
        self._fwd_blind = jax.jit(self._blind_forward)

    @classmethod
    def from_args(cls, args: dict, backend: str = "pallas", **kw):
        """Build from a reference-schema args dict (loads the checkpoint in
        paths.ckpt — torch .ckpt, .npz, or .orbax). The fused-kernel backend
        is requested only for model families that have one (CDLNet/GDLNet/
        CDLNetVideo); others build unchanged."""
        import dataclasses

        from cdlnet_tpu.models.base import MODEL_REGISTRY
        from cdlnet_tpu.train.fit import init_model

        args = dict(args)
        cls_ = MODEL_REGISTRY.get(
            {"JDD_CDLNet": "CDLNet"}.get(args["type"], args["type"])
        )
        if cls_ is not None and any(
            f.name == "backend" for f in dataclasses.fields(cls_)
        ):
            args["model"] = dict(args["model"], backend=backend)
        model, params, _, _, _, _ = init_model(args)
        if isinstance(params, tuple):  # DnCNN-style (params, state)
            params = params[0]
        return cls(model, params, **kw)

    @classmethod
    def from_dir(cls, path: str, **kw):
        """Build from a trained-model directory holding an args.json (e.g.
        examples/cdlnet-demo). The checkpoint path inside args.json is
        re-anchored to the directory when its recorded (train-time) path
        does not exist on this machine, so committed model dirs serve
        anywhere."""
        import json

        with open(os.path.join(path, "args.json")) as f:
            args = json.load(f)
        ck = (args.get("paths") or {}).get("ckpt")
        if ck and not os.path.exists(ck):
            local = os.path.join(path, os.path.basename(ck))
            if os.path.exists(local):
                args["paths"]["ckpt"] = local
        return cls.from_args(args, **kw)

    def _blind_forward(self, p, y):
        from cdlnet_tpu import nle

        if y.ndim == 5:  # clip: estimate framewise, average
            N, C, D, H, W = y.shape
            s = nle.noise_level(
                jnp.moveaxis(y, 2, 1).reshape(N * D, C, H, W), method=self.blind
            )
            s = 255.0 * jnp.mean(s.reshape(N, D), axis=1).reshape(N, 1, 1, 1, 1)
            if self._is_csr:  # the recurrence takes one sigma per clip
                s = jnp.mean(s)
        else:
            s = 255.0 * nle.noise_level(y, method=self.blind)
        return self._fwd.__wrapped__(p, y, s)

    def _run(self, y: np.ndarray, sigma):
        """y: (N, C, [D,] H, W) float32 [0,1]; pads H/W up to buckets (the
        depth axis of clips is NOT bucketed — temporal padding would change
        results and waste compute; long clips use denoise_video's chunking)."""
        spatial = y.shape[-2:]
        pads = [(_bucket(n, self.bucket) - n) for n in spatial]
        if any(pads):
            cfg = [(0, 0)] * (y.ndim - 2) + [(0, p) for p in pads]
            y = np.pad(y, cfg, mode="reflect")
        yj = jnp.asarray(y)
        if self._shard_batch is not None:
            yj = self._shard_batch(yj)
        try:
            if sigma is None and getattr(self.model, "adaptive", False):
                out = self._fwd_blind(self.params, yj)
            elif np.ndim(sigma) > 0:
                # per-sample sigmas in ONE forward (the models take c with a
                # leading batch dim, same as the blind path's MAD estimates)
                c = jnp.asarray(np.asarray(sigma, np.float32)).reshape(
                    (-1,) + (1,) * (yj.ndim - 1)
                )
                out = self._fwd(self.params, yj, c)
            else:
                out = self._fwd(self.params, yj, None if sigma is None else float(sigma))
        except jax.errors.JaxRuntimeError:
            # fused-kernel VMEM estimates are approximate; an XLA/Mosaic
            # compile or runtime failure (OOM on an unusual shape) falls back
            # to the XLA path permanently. Anything else (shape errors, NaN
            # asserts, interrupts) propagates — demoting the backend would
            # mask the bug and silently change the serving perf profile.
            if getattr(self.model, "backend", "xla") == "pallas":
                import dataclasses

                self.model = dataclasses.replace(self.model, backend="xla")
                self._build_fwd()
                return self._run(
                    np.asarray(y)[..., : spatial[0], : spatial[1]], sigma
                )
            raise
        out = np.asarray(out)
        return out[..., : spatial[0], : spatial[1]]

    def denoise_image(self, img: np.ndarray, sigma=None) -> np.ndarray:
        """img: (H, W), (C, H, W) or (N, C, H, W) float in [0,1]."""
        img = np.asarray(img, np.float32)
        squeeze = 4 - img.ndim
        for _ in range(squeeze):
            img = img[None]
        out = self._run(img, sigma)
        for _ in range(squeeze):
            out = out[0]
        return out

    def denoise_image_batch(self, imgs, sigmas=None) -> np.ndarray:
        """One forward over a stack of same-shape images with PER-SAMPLE
        noise levels — the TPU-serving batching primitive (server.py's
        request coalescer rides on this).

        imgs: (N, C, H, W) array or a sequence of same-shape (H, W) /
        (C, H, W) images; sigmas: None (all blind), a scalar, or a
        length-N sequence of floats. Returns the denoised stack with the
        input's per-image layout."""
        if not isinstance(imgs, np.ndarray):
            imgs = np.stack([np.asarray(im, np.float32) for im in imgs])
        imgs = np.asarray(imgs, np.float32)
        squeeze = 4 - imgs.ndim  # (N,H,W) sequences need a channel dim
        for _ in range(squeeze):
            imgs = imgs[:, None]
        if sigmas is not None and np.ndim(sigmas) > 0:
            if len(sigmas) != imgs.shape[0]:
                raise ValueError(
                    f"{len(sigmas)} sigmas for {imgs.shape[0]} images")
            sigmas = np.asarray(sigmas, np.float32)
        out = self._run(imgs, sigmas)
        for _ in range(squeeze):
            out = out[:, 0]
        return out

    def denoise_video(self, clip: np.ndarray, sigma=None, chunk_depth=None,
                      overlap=4, tile_hw=None, overlap_hw=16) -> np.ndarray:
        """clip: (D, H, W), (C, D, H, W) or (N, C, D, H, W) in [0,1]. Long
        clips stream in fixed memory via overlap-discard chunks
        (models/streaming.py) when chunk_depth is set; big frames
        additionally tile spatially when tile_hw is set (int or (th, tw)),
        keeping e.g. 720p/1080p video on the fused-kernel fast path — one
        compile per tile shape instead of per frame size."""
        clip = np.asarray(clip, np.float32)
        squeeze = 5 - clip.ndim
        for _ in range(squeeze):
            clip = clip[None]
        if tile_hw is not None:
            from cdlnet_tpu.models.streaming import denoise_video_tiled

            out = np.asarray(
                denoise_video_tiled(
                    self.model, self.params, jnp.asarray(clip), sigma,
                    chunk_depth=chunk_depth or clip.shape[2],
                    overlap=overlap, tile_hw=tile_hw, overlap_hw=overlap_hw,
                )
            )
        elif chunk_depth is not None and clip.shape[2] > chunk_depth:
            from cdlnet_tpu.models.streaming import (
                denoise_long_video,
                denoise_long_video_pipelined,
            )

            spatial = clip.shape[3:]
            pads = [(_bucket(n, self.bucket) - n) for n in spatial]
            if any(pads):
                clip = np.pad(
                    clip, [(0, 0)] * 3 + [(0, p) for p in pads], mode="reflect"
                )
            # route by staging size: clips that fit device memory stage
            # ONCE and chunk on device (one big H2D — fastest on links
            # that serialize transfers with compute, measured r5: the
            # axon tunnel runs chunked H2D/compute FIFO, so host-side
            # chunk pipelining gained nothing there); clips too big to
            # stage stream host-side with pipelined chunk transfers in
            # fixed device memory
            if clip.nbytes <= int(2e9):
                out = np.asarray(
                    denoise_long_video(
                        self.model, self.params, jnp.asarray(clip), sigma,
                        chunk_depth=chunk_depth, overlap=overlap,
                    )
                )[..., : spatial[0], : spatial[1]]
            else:
                out = denoise_long_video_pipelined(
                    self.model, self.params, clip, sigma,
                    chunk_depth=chunk_depth, overlap=overlap,
                )[..., : spatial[0], : spatial[1]]
        else:
            out = self._run(clip, sigma)
        for _ in range(squeeze):
            out = out[0]
        return out

    def warmup(self, shapes):
        """Pre-compile the buckets for a list of (H, W) or (D, H, W) shapes."""
        for shape in shapes:
            if len(shape) == 2:
                self.denoise_image(np.zeros(shape, np.float32), sigma=25)
            else:
                self.denoise_video(np.zeros(shape, np.float32), sigma=25)
