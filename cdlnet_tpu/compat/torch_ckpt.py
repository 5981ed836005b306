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
import jax
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


def param_order(model) -> list:
    """The reference nets' `net.parameters()` ordering, as addresses into our
    params pytree.

    torch.optim state dicts key their per-parameter state by INDEX into the
    flat parameter list handed to the optimizer — `Adam(net.parameters())`
    (train.py:200) — so importing Adam moments requires reproducing that
    order exactly. `named_parameters` yields the module's own parameters in
    registration order, then each submodule's in registration order,
    de-duplicating aliases (D = B[0], net.py:34; GDLNet's shared Gabor
    parameter objects, net.py:607-622) at first occurrence. Orders below were
    verified against the live reference modules (see
    tools/opt_state_gate.py).

    Returns a list of (key, index) addresses: `params[key]` when index is
    None, else `params[key][index]` (stacked per-iteration leaves).
    """
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

    def banks(*names):
        return [(nm, k) for nm in names for k in range(K)]

    if isinstance(model, CDLNetVideo):
        order = [("t", None)] + banks("A", "B")
        if model.residual:
            for k in range(K):
                order += [(("residual", "conv1"), k), (("residual", "conv2"), k)]
        return order
    if isinstance(model, CDLNet):
        return [("t", None), ("g", None)] + banks("A", "B")
    if isinstance(model, CDLNetCSRf2):
        return [("t", None), ("g1", None), ("g2", None)] + banks("A", "B")
    if isinstance(model, CDLNetCSR):
        return [("t", None), ("t2", None), ("g", None)] + banks("A", "B", "A2", "B2")
    if isinstance(model, GDLNet):
        # per-op params in ConvAdjoint2dGabor registration order (gabor.py:36-39)
        # with shared objects dedup'd: a/w0/psi shared -> only op 0 owns them;
        # alpha shared -> A.0 and B.0/B.1 own it (B[0] is the dictionary and
        # never shares alpha, net.py:611-613)
        order = [("t", None)]
        for bank in ("A", "B"):
            for k in range(K):
                for name in ("alpha", "a", "w0", "psi"):
                    if not model._is_shared(name):
                        order.append((f"{bank}_{name}", k))
                    elif name == "alpha":
                        if bank == "A" and k == 0:
                            order.append(("A_alpha", None))
                        elif bank == "B" and k <= 1:
                            order.append(("B_alpha", k))
                    elif k == 0:
                        order.append((f"{bank}_{name}", None))
        return order
    if isinstance(model, (DnCNN, FFDNet)):
        dn = model.dncnn if isinstance(model, FFDNet) else model
        nmid = dn.K - 2
        order = [("w_in", None), ("b_in", None)]
        for i in range(nmid):
            order += [("w_mid", i), ("bn_scale", i), ("bn_bias", i)]
        return order + [("w_out", None), ("b_out", None)]
    raise NotImplementedError(type(model))


def _leaf_get(params, addr):
    key, idx = addr
    leaf = params
    for part in key if isinstance(key, tuple) else (key,):
        leaf = leaf[part]
    return leaf if idx is None else leaf[idx]


def _leaf_set(tree, addr, value):
    """In-place write into a NUMPY pytree (full leaf or stacked slice)."""
    key, idx = addr
    parts = key if isinstance(key, tuple) else (key,)
    parent = tree
    for part in parts[:-1]:
        parent = parent[part]
    if idx is None:
        parent[parts[-1]] = np.asarray(value, dtype=parent[parts[-1]].dtype)
    else:
        parent[parts[-1]][idx] = np.asarray(value)


def _find_adam(opt_state):
    """(inject_hyperparams wrapper, ScaleByAdamState) inside the optimizer
    chain built by train.optim.make_optimizer."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "hyperparams"):
            for j, inner in enumerate(s.inner_state):
                if hasattr(inner, "mu"):
                    return i, s, j, inner
    raise ValueError("no Adam state found in opt_state")


def import_opt_state(model, opt_sd: dict, opt_state, params):
    """Map a torch Adam `opt_state_dict` onto our optax opt_state so a
    torch-trained run resumes with identical training dynamics.

    The reference resume restores optimizer state (train.py:232-247:
    `opt.load_state_dict(ckpt['opt_state_dict'])`). torch Adam state is
    {'state': {idx: {'step', 'exp_avg', 'exp_avg_sq'}}, 'param_groups':
    [{'lr', 'betas', 'eps', 'params': [idx...]}]} — exp_avg/exp_avg_sq map
    1:1 onto optax ScaleByAdamState mu/nu (same update rule and bias
    correction; optax increments count before use exactly as torch uses the
    incremented `step`), and the live param-group lr overwrites the injected
    learning_rate hyperparameter. Params the torch run never gave state
    (never received a gradient) keep zero moments — torch lazily initializes
    to zeros too. Returns a new opt_state.
    """
    order = param_order(model)
    idxs = [i for g in opt_sd["param_groups"] for i in g["params"]]
    if len(idxs) != len(order):
        raise ValueError(
            f"torch optimizer tracks {len(idxs)} params, model maps {len(order)}"
        )
    tstate = opt_sd.get("state", {})

    i, inj, j, adam = _find_adam(opt_state)
    mu = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32), params)
    nu = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32), params)
    step = 0
    for pos, addr in zip(idxs, order):
        st = tstate.get(pos) or tstate.get(str(pos))
        if st is None:
            continue
        _leaf_set(mu, addr, st["exp_avg"])
        _leaf_set(nu, addr, st["exp_avg_sq"])
        step = max(step, int(np.asarray(st["step"])))

    count = jnp.asarray(step, jnp.int32)
    adam = adam._replace(count=count, mu=_jnpify(mu), nu=_jnpify(nu))
    inner = tuple(adam if jj == j else s for jj, s in enumerate(inj.inner_state))
    group = opt_sd["param_groups"][0]
    # copy-on-write: hyperparams is the caller's dict — mutating it in place
    # would corrupt the pre-import opt_state the caller may keep as fallback
    hp = dict(inj.hyperparams)
    hp["learning_rate"] = jnp.asarray(group["lr"], jnp.float32)
    if "betas" in group:
        hp["b1"] = jnp.asarray(group["betas"][0], jnp.float32)
        hp["b2"] = jnp.asarray(group["betas"][1], jnp.float32)
    if "eps" in group:
        hp["eps"] = jnp.asarray(group["eps"], jnp.float32)
    inj = inj._replace(count=count, inner_state=inner, hyperparams=hp)
    return tuple(inj if ii == i else s for ii, s in enumerate(opt_state))


def export_opt_state(model, opt_state, params) -> dict:
    """Inverse of import_opt_state: optax opt_state -> torch Adam
    opt_state_dict (numpy values), so checkpoints written here resume in the
    reference with intact moments (train.py:232-247)."""
    order = param_order(model)
    _, inj, _, adam = _find_adam(opt_state)
    step = int(np.asarray(adam.count))
    state = {}
    for pos, addr in enumerate(order):
        state[pos] = {
            "step": np.float32(step),
            "exp_avg": np.asarray(_leaf_get(adam.mu, addr)),
            "exp_avg_sq": np.asarray(_leaf_get(adam.nu, addr)),
        }
    hp = inj.hyperparams
    return {
        "state": state,
        "param_groups": [
            {
                "lr": float(np.asarray(hp["learning_rate"])),
                "betas": (
                    float(np.asarray(hp.get("b1", 0.9))),
                    float(np.asarray(hp.get("b2", 0.999))),
                ),
                "eps": float(np.asarray(hp.get("eps", 1e-8))),
                "weight_decay": 0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(len(order))),
            }
        ],
    }


def import_sched_state(sched_sd: dict | None) -> dict | None:
    """torch StepLR sched_state_dict -> {step_size, gamma, base_lr,
    last_epoch} for fit()'s host-side StepLR policy (train.py:144-148).
    Returns None when absent."""
    if not sched_sd:
        return None
    return {
        "step_size": int(sched_sd["step_size"]),
        "gamma": float(sched_sd["gamma"]),
        "base_lr": float(sched_sd["base_lrs"][0]),
        "last_epoch": int(sched_sd["last_epoch"]),
    }


def export_sched_state(sched: dict | None, lr: float, epoch: int) -> dict | None:
    """fit()'s sched spec -> torch StepLR state dict shape."""
    if sched is None:
        return None
    gamma = float(sched["gamma"])
    step_size = int(sched["step_size"])
    decays = epoch // step_size
    return {
        "step_size": step_size,
        "gamma": gamma,
        "base_lrs": [lr / (gamma**decays) if gamma else lr],
        "last_epoch": epoch,
        "_step_count": epoch + 1,
        "verbose": False,
        "_get_lr_called_within_step": False,
        "_last_lr": [lr],
    }


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


def save_torch_checkpoint(path: str, model, params, epoch: int = 0,
                          opt_state=None, sched: dict | None = None,
                          lr: float | None = None):
    """Write a reference-format .ckpt readable by the torch codebase.

    With opt_state given, the Adam moments are exported too so the reference
    resumes mid-flight with intact training dynamics (train.py:232-247);
    sched (fit()'s {step_size, gamma} spec) and the live lr reconstruct the
    StepLR state dict."""
    import torch

    def t(obj):
        if isinstance(obj, dict):
            return {k: t(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(t(v) for v in obj)
        if isinstance(obj, np.ndarray):
            return torch.from_numpy(np.array(obj))
        return obj

    opt_sd = None
    if opt_state is not None:
        opt_sd = export_opt_state(model, opt_state, params)
        if lr is None:
            lr = opt_sd["param_groups"][0]["lr"]
    sched_sd = export_sched_state(sched, lr, epoch) if lr is not None else None
    torch.save(
        {
            "epoch": epoch,
            "net_state_dict": t(export_net_state(model, params)),
            "opt_state_dict": t(opt_sd),
            "sched_state_dict": sched_sd,
        },
        path,
    )
