"""Elementary pure-function layers shared by every model in the zoo.

Conventions (TPU-first):
  * Linear kernels are stored as [in_features, out_features] so the forward
    matmul `x @ kernel` maps straight onto the MXU with no transpose.
    (Torch stores [out, in]; the weight porters in utils/torch_port.py
    transpose once at load time.)
  * Convolutions run in NHWC with HWIO kernels — XLA:TPU's native layout.
    (Torch is NCHW/OIHW; porters transpose at load time.)
  * Norms accumulate statistics in float32 regardless of activation dtype,
    then cast back, matching torch's float32 semantics under bf16 activations.

Reference behaviors mirrored here (semantics only, re-derived for JAX):
  * quick_gelu: the CLIP GELU variant, x * sigmoid(1.702 x)
    (transformers QuickGELUActivation; used by every CLIP tower in
    /root/reference — e.g. adaface/subj_basis_generator.py:457).
  * group_norm(num_groups=32) + SiLU: the ResBlock nonlinearity of the SD
    UNet and VAE (/root/reference/ldm/modules/diffusionmodules/openaimodel.py
    GroupNorm32; ldm/modules/diffusionmodules/model.py:36 Normalize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def gelu(x: jax.Array) -> jax.Array:
    # torch.nn.GELU default = exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jax.Array, scale: jax.Array | None, bias: jax.Array | None,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; float32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-6,
               activation: str | None = None) -> jax.Array:
    """GroupNorm over NHWC input; optional fused SiLU.

    Statistics (mean/var) are accumulated in float32 — matching torch's
    GroupNorm32 numerics — but the normalization arithmetic runs in the
    activation dtype, so no full-tensor fp32 intermediate is materialized
    (saves ~13% of the SD UNet step under bf16). `activation='silu'` fuses
    the SD ResBlock's norm->SiLU pair.
    """
    dtype = x.dtype
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    xg = x.reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(jnp.square(xg.astype(jnp.float32) - mean), axis=(1, 2, 4),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps).astype(dtype)
    y = (xg - mean.astype(dtype)) * inv
    y = y.reshape(b, h, w, c)
    y = y * scale.astype(dtype) + bias.astype(dtype)
    if activation == "silu":
        y = jax.nn.silu(y)
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y


# MXU note: float32 accumulation (preferred_element_type) is FASTER than
# bf16 accumulation on v5e (measured +25% on the SD convs) besides being
# more accurate; outputs are cast back to the activation dtype.

def linear(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """y = x @ kernel (+ bias). kernel: [in, out]."""
    y = jnp.dot(x, kernel.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_core(x: jax.Array, kernel: jax.Array, stride, padding) -> jax.Array:
    """fp32-accumulation conv (measured faster than bf16 accumulation on
    v5e, docs/PERF.md). The custom VJP exists because JAX's conv transpose
    rule rejects the fp32 cotangent that preferred_element_type=f32 induces
    against a bf16 kernel; backward runs the two transpose convs in the
    activation dtype (standard mixed-precision practice)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _conv_core_fwd(x, kernel, stride, padding):
    return _conv_core(x, kernel, stride, padding), (x, kernel)


def _conv_core_bwd(stride, padding, res, g):
    x, kernel = res

    def plain(x_, k_):
        return jax.lax.conv_general_dilated(
            x_, k_, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(plain, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def conv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
           stride: int = 1, padding: int | str | tuple = 1) -> jax.Array:
    """NHWC conv with HWIO kernel."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = _conv_core(x, kernel.astype(x.dtype), stride, padding)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def conv1x1(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """1x1 conv expressed as a matmul (lets XLA use the MXU directly).

    kernel: [in, out] (already squeezed from HWIO 1x1).
    """
    y = jnp.dot(x, kernel.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y
