"""PyTorch checkpoint interop.

The reference checkpoints are torch.save dicts
{epoch, net_state_dict, opt_state_dict, sched_state_dict} (train.py:221-247).
Weights already share our layout (we keep torch's OIHW conv layout in ops/),
so import is a key-schema mapping plus stacking the per-iteration ModuleList
entries along K:

  CDLNet:        A.{k}.weight, B.{k}.weight -> A/B (K,M,C,P,P); t, g
  CDLNetVideo:   + 6-D t, residual_blocks.{k}.conv{1,2}.weight
  GDLNet:        A.{k}.{alpha,a,w0,psi}, B.{k}.* (shared params are
                 duplicated per-k in torch state dicts; we de-duplicate per
                 the model's `shared` config)
  CDLNet_CSR:    + A2/B2/t2/g;  CDLNet_CSRf2: + g1/g2
  DnCNN/FFDNet:  dncnn.{i}.* Sequential indices (conv/BN interleaving)

torch is used only here, lazily — the rest of the framework never imports it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _to_numpy(obj):
    """Recursively convert torch tensors to numpy."""
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .ckpt; returns dict with numpy-converted state dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return _to_numpy(ckpt)


def _stack(sd: dict, fmt: str, K: int) -> np.ndarray:
    return np.stack([np.asarray(sd[fmt.format(k=k)]) for k in range(K)])


def import_net_state(model, state_dict: dict) -> dict:
    """Map a torch net_state_dict onto a params pytree for `model` (a config
    object from cdlnet_tpu.models)."""
    from cdlnet_tpu.models import (
        CDLNet,
        CDLNetVideo,
        GDLNet,
        CDLNetCSR,
        CDLNetCSRf2,
        DnCNN,
        FFDNet,
    )

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    K = getattr(model, "K", None)

    if isinstance(model, (CDLNet, CDLNetVideo)):
        params = {
            "A": _stack(sd, "A.{k}.weight", K),
            "B": _stack(sd, "B.{k}.weight", K),
            "t": sd["t"],
        }
        if isinstance(model, CDLNet):
            # unused-but-registered parameter (model/net.py:36)
            params["g"] = sd.get("g", np.zeros_like(sd["t"]))
        if isinstance(model, CDLNetVideo) and model.residual:
            params["residual"] = {
                "conv1": _stack(sd, "residual_blocks.{k}.conv1.weight", K),
                "conv2": _stack(sd, "residual_blocks.{k}.conv2.weight", K),
            }
    elif isinstance(model, GDLNet):
        params = {"t": sd["t"]}
        for bank in ("A", "B"):
            for name in ("alpha", "a", "w0", "psi"):
                key = f"{bank}_{name}"
                if not model._is_shared(name):
                    params[key] = _stack(sd, bank + ".{k}." + name, K)
                elif name == "alpha" and bank == "B":
                    params[key] = np.stack(
                        [sd["B.0.alpha"], sd["B.1.alpha" if K > 1 else "B.0.alpha"]]
                    )
                else:
                    params[key] = sd[f"{bank}.0.{name}"]
    elif isinstance(model, CDLNetCSRf2):
        params = {
            "A": _stack(sd, "A.{k}.weight", K),
            "B": _stack(sd, "B.{k}.weight", K),
            "t": sd["t"],
            "g1": sd["g1"],
            "g2": sd["g2"],
        }
    elif isinstance(model, CDLNetCSR):
        params = {
            "A": _stack(sd, "A.{k}.weight", K),
            "B": _stack(sd, "B.{k}.weight", K),
            "A2": _stack(sd, "A2.{k}.weight", K),
            "B2": _stack(sd, "B2.{k}.weight", K),
            "t": sd["t"],
            "t2": sd["t2"],
            "g": sd["g"],
        }
    elif isinstance(model, (DnCNN, FFDNet)):
        dn = model.dncnn if isinstance(model, FFDNet) else model
        nmid = dn.K - 2
        params = {
            "w_in": sd["dncnn.0.weight"],
            "b_in": sd["dncnn.0.bias"],
            "w_mid": np.stack([sd[f"dncnn.{2 + 3 * i}.weight"] for i in range(nmid)]),
            "bn_scale": np.stack([sd[f"dncnn.{3 + 3 * i}.weight"] for i in range(nmid)]),
            "bn_bias": np.stack([sd[f"dncnn.{3 + 3 * i}.bias"] for i in range(nmid)]),
            "w_out": sd[f"dncnn.{2 + 3 * nmid}.weight"],
            "b_out": sd[f"dncnn.{2 + 3 * nmid}.bias"],
        }
        state = {
            "bn_mean": np.stack([sd[f"dncnn.{3 + 3 * i}.running_mean"] for i in range(nmid)]),
            "bn_var": np.stack([sd[f"dncnn.{3 + 3 * i}.running_var"] for i in range(nmid)]),
        }
        params = (params, state)
    else:
        raise NotImplementedError(type(model))

    return _jnpify(params)


def _jnpify(obj):
    if isinstance(obj, dict):
        return {k: _jnpify(v) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return tuple(_jnpify(v) for v in obj)
    return jnp.asarray(obj)


def export_net_state(model, params) -> dict:
    """Inverse of import_net_state: params pytree -> torch-style state dict
    (numpy values), so checkpoints written here load in the reference."""
    from cdlnet_tpu.models import (
        CDLNet,
        CDLNetVideo,
        GDLNet,
        CDLNetCSR,
        CDLNetCSRf2,
        DnCNN,
        FFDNet,
    )

    K = getattr(model, "K", None)
    sd: dict = {}

    def unstack(name_fmt, arr):
        for k in range(arr.shape[0]):
            sd[name_fmt.format(k=k)] = np.asarray(arr[k])

    if isinstance(model, (CDLNet, CDLNetVideo)):
        unstack("A.{k}.weight", params["A"])
        unstack("B.{k}.weight", params["B"])
        sd["D.weight"] = np.asarray(params["B"][0])  # torch registers the alias
        sd["t"] = np.asarray(params["t"])
        if isinstance(model, CDLNet):
            sd["g"] = np.asarray(params.get("g", np.zeros_like(params["t"])))
        if isinstance(model, CDLNetVideo) and model.residual:
            unstack("residual_blocks.{k}.conv1.weight", params["residual"]["conv1"])
            unstack("residual_blocks.{k}.conv2.weight", params["residual"]["conv2"])
    elif isinstance(model, GDLNet):
        sd["t"] = np.asarray(params["t"])
        for bank in ("A", "B"):
            for name in ("alpha", "a", "w0", "psi"):
                v = np.asarray(params[f"{bank}_{name}"])
                if not model._is_shared(name):
                    unstack(bank + ".{k}." + name, v)
                elif name == "alpha" and bank == "B":
                    sd["B.0.alpha"] = v[0]
                    for k in range(1, K):
                        sd[f"B.{k}.alpha"] = v[1]
                else:
                    for k in range(K):
                        sd[f"{bank}.{k}.{name}"] = v
    elif isinstance(model, CDLNetCSRf2):
        unstack("A.{k}.weight", params["A"])
        unstack("B.{k}.weight", params["B"])
        sd["D.weight"] = np.asarray(params["B"][0])
        sd["t"], sd["g1"], sd["g2"] = (
            np.asarray(params["t"]),
            np.asarray(params["g1"]),
            np.asarray(params["g2"]),
        )
    elif isinstance(model, CDLNetCSR):
        for nm in ("A", "B", "A2", "B2"):
            unstack(nm + ".{k}.weight", params[nm])
        sd["D.weight"] = np.asarray(params["B"][0])
        for nm in ("t", "t2", "g"):
            sd[nm] = np.asarray(params[nm])
    elif isinstance(model, (DnCNN, FFDNet)):
        p, st = params if isinstance(params, tuple) else (params, None)
        dn = model.dncnn if isinstance(model, FFDNet) else model
        nmid = dn.K - 2
        sd["dncnn.0.weight"], sd["dncnn.0.bias"] = np.asarray(p["w_in"]), np.asarray(p["b_in"])
        for i in range(nmid):
            sd[f"dncnn.{2 + 3 * i}.weight"] = np.asarray(p["w_mid"][i])
            sd[f"dncnn.{3 + 3 * i}.weight"] = np.asarray(p["bn_scale"][i])
            sd[f"dncnn.{3 + 3 * i}.bias"] = np.asarray(p["bn_bias"][i])
            if st is not None:
                sd[f"dncnn.{3 + 3 * i}.running_mean"] = np.asarray(st["bn_mean"][i])
                sd[f"dncnn.{3 + 3 * i}.running_var"] = np.asarray(st["bn_var"][i])
                sd[f"dncnn.{3 + 3 * i}.num_batches_tracked"] = np.asarray(0)
        sd[f"dncnn.{2 + 3 * nmid}.weight"] = np.asarray(p["w_out"])
        sd[f"dncnn.{2 + 3 * nmid}.bias"] = np.asarray(p["b_out"])
    else:
        raise NotImplementedError(type(model))
    return sd


def save_torch_checkpoint(path: str, model, params, epoch: int = 0):
    """Write a reference-format .ckpt readable by the torch codebase."""
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in export_net_state(model, params).items()}
    torch.save(
        {
            "epoch": epoch,
            "net_state_dict": sd,
            "opt_state_dict": None,
            "sched_state_dict": None,
        },
        path,
    )
