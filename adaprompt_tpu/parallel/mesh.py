"""Device mesh + sharding rules.

The reference's entire "distributed system" is 2-GPU Lightning DDP with NCCL
grad all-reduce (SURVEY.md §2.6; main.py:829 strategy='ddp'). The TPU-native
equivalent is a jax.sharding Mesh over ICI with GSPMD-inserted collectives:

  * axis 'dp'   — data parallel: batch sharded, grads all-reduced (psum)
  * axis 'fsdp' — optional parameter/optimizer-state sharding (ZeRO-style):
    large kernels sharded on their output axis, all-gathered by XLA at use

All rules are sharding *annotations*; XLA emits the collectives. No NCCL/MPI
translation, no manual all-reduce.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, fsdp: int = 1,
              devices=None) -> Mesh:
    """2D (dp, fsdp) mesh. fsdp=1 -> pure data parallel."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(devices)} "
            f"devices are visible ({[d.platform for d in devices]}); for CPU "
            "test meshes set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} before jax initializes, or pass devices= explicitly")
    devices = np.asarray(devices[:n_devices])
    assert n_devices % fsdp == 0, (n_devices, fsdp)
    dp = n_devices // fsdp
    return Mesh(devices.reshape(dp, fsdp), ("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp (replicated over fsdp)."""
    return NamedSharding(mesh, P("dp"))


def batch_spec() -> P:
    return P("dp")


def param_spec(path: tuple, leaf: jax.Array, fsdp_min_size: int = 2 ** 18) -> P:
    """FSDP rule: shard the largest axis of big kernels over 'fsdp',
    replicate everything small (norm scales, biases)."""
    if leaf.ndim < 2 or leaf.size < fsdp_min_size:
        return P()
    ax = int(np.argmax(leaf.shape))
    spec = [None] * leaf.ndim
    spec[ax] = "fsdp"
    return P(*spec)


def shard_params(params, mesh: Mesh, fsdp_min_size: int = 2 ** 18):
    """Place a param pytree onto the mesh under the FSDP rule (no-op
    replication when the fsdp axis is 1)."""
    def place(path, leaf):
        spec = param_spec(path, leaf, fsdp_min_size)
        # axis size must divide the dim; fall back to replication
        for i, s in enumerate(spec):
            if s is not None and leaf.shape[i] % mesh.shape["fsdp"] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
