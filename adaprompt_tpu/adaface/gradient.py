"""Gradient scaling — identity forward, scaled backward.

JAX equivalent of the reference's ScaleGrad autograd Function / GradientScaler
(/root/reference/adaface/util.py:28-72): alpha=1 is identity, alpha=0 is
stop_gradient, otherwise grads are multiplied by alpha.
"""

from __future__ import annotations

import jax


def grad_scale(x, alpha: float):
    if alpha == 1.0:
        return x
    if alpha == 0.0:
        return jax.lax.stop_gradient(x)
    return _scaled(x, alpha)


def _scaled(x, alpha):
    @jax.custom_vjp
    def f(x):
        return x

    def fwd(x):
        return x, None

    def bwd(_, g):
        return (jax.tree.map(lambda t: t * alpha, g),)

    f.defvjp(fwd, bwd)
    return f(x)
