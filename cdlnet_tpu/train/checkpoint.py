"""Checkpointing: native .npz bundles (params + optimizer state + epoch/lr)
with exact restore for the backtracking policy, plus reference-format torch
export via compat.

Format: single .npz with path-flattened pytree leaves under 'p::' (params),
'o::' (opt state leaves), and a json-encoded meta blob (epoch, lr, tree
structure is reconstructed from the live templates on load — load_ckpt
requires matching shapes, same as torch load_state_dict).

Reference counterpart: train.py:221-247 ({epoch, net/opt/sched state dicts},
partial loading allowed).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(prefix: str, tree) -> dict:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten(prefix: str, template, data: dict):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + jax.tree_util.keystr(path)
        if key in data:
            arr = jnp.asarray(data[key])
            if hasattr(leaf, "dtype"):
                arr = arr.astype(leaf.dtype)
            leaves.append(arr)
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --- orbax async backend (SURVEY.md §5: preemption-safe checkpointing) ---
#
# Preemption safety is SIDE-WRITE + PROMOTE, not force-overwrite: orbax's
# save(force=True) DELETES the existing complete checkpoint before the
# async write lands (verified by SIGKILL mid-save: both checkpoints lost),
# so instead every save goes to {path}.new — orbax itself writes a
# *.orbax-checkpoint-tmp dir and renames it to {path}.new only on
# completion — and a finished {path}.new is promoted over {path} at the
# next save/wait/load. At every instant at least one COMPLETE checkpoint
# exists: a kill mid-write leaves {path} (plus an ignored tmp dir); a kill
# between completion and promotion leaves {path}.new, which load promotes.
_ORBAX = None
_ORBAX_PENDING: set = set()


def _orbax_ckptr():
    global _ORBAX
    if _ORBAX is None:
        import orbax.checkpoint as ocp

        _ORBAX = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ORBAX


def _orbax_promote(path: str):
    """Fold a COMPLETED side-write ({path}.new) over {path}. Only call with
    no async write of this path in flight. Crash-safe: .new is complete by
    construction (orbax renames its tmp dir only on completion), and a
    crash between rmtree and rename leaves .new for the next promotion."""
    import shutil

    new = path + ".new"
    if os.path.isdir(new):
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(new, path)


def _orbax_settle():
    """Wait for the in-flight write (if any) and promote every completed
    side-write."""
    if _ORBAX is not None:
        _ORBAX.wait_until_finished()
    while _ORBAX_PENDING:
        _orbax_promote(_ORBAX_PENDING.pop())


def wait_for_checkpoints():
    """Block until any in-flight async (orbax) checkpoint save completes
    and promote it. Call before process exit or before restoring the same
    path."""
    _orbax_settle()


def save_ckpt(path: str, params, epoch: int = 0, opt_state=None, lr: float = None, extra: dict = None):
    """Save params (+optimizer state) to an .npz bundle."""
    import shutil

    data = _flatten("p::", params)
    if opt_state is not None:
        data.update(_flatten("o::", opt_state))
    meta = {"epoch": epoch, "lr": lr}
    if extra:
        meta.update(extra)
    data["meta::json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    if path.endswith(".orbax"):
        # async side-write: returns as soon as arrays are snapshotted off
        # the live buffers; see the preemption-safety note above
        ckptr = _orbax_ckptr()
        _orbax_settle()
        apath = os.path.abspath(path)
        _orbax_promote(apath)  # fold a .new left by a previous process
        new = apath + ".new"
        for stale in (new, new + ".orbax-checkpoint-tmp"):
            if os.path.isdir(stale):  # torn leftovers from a preemption
                shutil.rmtree(stale)
        ckptr.save(new, data)
        _ORBAX_PENDING.add(apath)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    final = path if path.endswith(".npz") else path + ".npz"
    # atomic replace: a preemption mid-write never clobbers the previous
    # complete bundle (np.savez in place would)
    tmp = final + ".tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, final)


def _resolve(path: str) -> str:
    # settle + promote first: after a preemption the newest complete
    # checkpoint may still be sitting at {path}.new
    _orbax_settle()
    for cand in (path, path + ".orbax"):
        if cand.endswith(".orbax"):
            _orbax_promote(os.path.abspath(cand))
    if os.path.exists(path):
        return path
    if os.path.exists(path + ".npz"):
        return path + ".npz"
    if os.path.exists(path + ".orbax"):
        return path + ".orbax"
    raise FileNotFoundError(path)


def load_ckpt(path: str, params_template, opt_state_template=None):
    """Restore (params, opt_state, epoch, lr) from an .npz bundle (or, for
    reference .ckpt torch files, import the net state only)."""
    path = _resolve(path)
    if path.endswith(".ckpt") or path.endswith(".pt") or path.endswith(".pth"):
        raise ValueError(
            "torch checkpoints are imported via compat.import_net_state with a "
            "model config; load_ckpt handles native .npz bundles"
        )
    if path.endswith(".orbax"):
        ckptr = _orbax_ckptr()
        ckptr.wait_until_finished()
        data = {k: np.asarray(v) for k, v in ckptr.restore(os.path.abspath(path)).items()}
    else:
        with np.load(path) as data:
            data = dict(data)
    meta = json.loads(bytes(data.pop("meta::json"))) if "meta::json" in data else {}
    params = _unflatten("p::", params_template, data)
    opt_state = None
    if opt_state_template is not None:
        opt_state = _unflatten("o::", opt_state_template, data)
    return params, opt_state, meta.get("epoch", 0), meta.get("lr")


def save_args(args: dict, save_dir: str, ckpt_name: str = "net.ckpt.npz"):
    """Re-serialize the args.json into the save dir with the ckpt path patched
    in, sorted keys (reference train.py:249-258)."""
    args = json.loads(json.dumps(args))  # deep copy
    args.setdefault("paths", {})["ckpt"] = os.path.join(save_dir, ckpt_name)
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        f.write(json.dumps(args, indent=4, sort_keys=True))
