"""AdaFace checkpoint save/load.

The reference's training artifact is `embeddings_gs-{step}.pt`
(EmbeddingManager.save, /root/reference/ldm/modules/embedding_manager.py:
1824-1838): a torch pickle holding string_to_subj_basis_generator_dict
(actual nn.Module objects), static embedders, token maps, and global scales.

This module provides:
  * native .npz checkpoints for our pytrees (flat path->array, json meta);
  * `load_reference_checkpoint`: loads the reference .pt WITHOUT the
    reference codebase — a custom Unpickler maps any 'adaface.*'/'ldm.*'
    class to a skeleton nn.Module (unpickling restores __dict__ directly,
    no __init__ call), then the parameter/buffer tree is walked into flat
    state dicts per placeholder, ready for subj_basis_generator.from_torch.
"""

from __future__ import annotations

import io
import json
import pickle

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Native npz checkpoints
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys) \
                and sorted(int(k) for k in keys) == list(range(len(keys))):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_pytree_leaves(path_prefix: str, tree, flat: dict):
    """Flatten ANY jax pytree (incl. NamedTuples/optax states) into indexed
    leaf arrays; structure is reconstructed against a freshly-initialized
    template on load (load_pytree_leaves)."""
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        flat[f"{path_prefix}/{i}"] = np.asarray(leaf)


def load_pytree_leaves(path_prefix: str, template, flat: dict):
    leaves, treedef = jax.tree.flatten(template)
    out = []
    for i, tmpl in enumerate(leaves):
        v = flat[f"{path_prefix}/{i}"]
        if hasattr(tmpl, "shape") and tuple(np.shape(v)) != tuple(np.shape(tmpl)):
            raise ValueError(f"{path_prefix}/{i}: shape {np.shape(v)} != "
                             f"template {np.shape(tmpl)}")
        out.append(jnp.asarray(v))
    return jax.tree.unflatten(treedef, out)


def save_checkpoint(path: str, trees: dict, meta: dict | None = None):
    """trees: {name: pytree}; stored flat as '<name>/<path>' arrays."""
    flat = {}
    for name, tree in trees.items():
        flat.update(_flatten(tree, name + "/"))
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_checkpoint(path: str):
    """-> (trees dict, meta dict)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    groups: dict = {}
    for k, v in flat.items():
        name, rest = k.split("/", 1)
        groups.setdefault(name, {})[rest] = v
    return {name: _unflatten(g) for name, g in groups.items()}, meta


# ---------------------------------------------------------------------------
# Reference torch checkpoint loading (no reference code required)
# ---------------------------------------------------------------------------

def _extract_state_dict(module_obj, prefix="") -> dict:
    """Walk a skeleton nn.Module's _parameters/_buffers/_modules."""
    sd = {}
    params = getattr(module_obj, "_parameters", {}) or {}
    for name, p in params.items():
        if p is not None:
            sd[prefix + name] = p.detach().float().cpu().numpy()
    buffers = getattr(module_obj, "_buffers", {}) or {}
    for name, b in buffers.items():
        if b is not None:
            sd[prefix + name] = b.detach().float().cpu().numpy()
    mods = getattr(module_obj, "_modules", {}) or {}
    for name, m in mods.items():
        if m is not None:
            sd.update(_extract_state_dict(m, prefix + name + "."))
    return sd


def load_reference_checkpoint(path: str) -> dict:
    """Load an embeddings_gs-*.pt reference checkpoint.

    Returns {'subj_basis_generators': {placeholder: flat state dict},
             'string_to_token': {...} if present, 'raw': other entries}.
    """
    import torch

    class _SkeletonModule(torch.nn.Module):
        pass

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith(("adaface", "ldm")):
                return type(name, (_SkeletonModule,), {"__module__": module})
            return super().find_class(module, name)

    # torch.load with a custom pickle_module shim
    class _PickleShim:
        Unpickler = _Unpickler
        load = staticmethod(lambda f, **kw: _Unpickler(f).load())

    ckpt = torch.load(path, map_location="cpu", pickle_module=_PickleShim,
                      weights_only=False)

    out = {"subj_basis_generators": {}, "raw": {}}
    sbg_dict = ckpt.get("string_to_subj_basis_generator_dict")
    if sbg_dict is not None:
        mods = getattr(sbg_dict, "_modules", None) or dict(sbg_dict)
        for placeholder, mod in mods.items():
            out["subj_basis_generators"][placeholder] = _extract_state_dict(mod)
    for k, v in ckpt.items():
        if k == "string_to_subj_basis_generator_dict":
            continue
        if hasattr(v, "detach"):
            out["raw"][k] = v.detach().float().cpu().numpy()
        elif isinstance(v, dict) and k == "string_to_token_dict":
            out["string_to_token"] = {s: int(t) for s, t in v.items()}
        else:
            out["raw"][k] = v
    return out
