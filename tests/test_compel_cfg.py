"""Parity: compel CFG weighting vs prob_apply_compel_cfg (prob forced to 1)."""

import random

import numpy as np
import torch
import jax.numpy as jnp

from adaprompt_tpu.adaface.compel_cfg import apply_compel_cfg

import torch_oracle


def test_compel_cfg_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(0)
    ctx = rng.standard_normal((4, 11, 8)).astype(np.float32)
    empty = rng.standard_normal((1, 11, 8)).astype(np.float32)
    bmask = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    level = 2.0

    random.seed(0)  # reference gates on random() <= prob; prob=1 always fires
    with torch.no_grad():
        ref = lutil.prob_apply_compel_cfg(torch.tensor(ctx), torch.tensor(empty),
                                          1.0, level,
                                          batch_mask=torch.tensor(bmask))
    got = apply_compel_cfg(jnp.asarray(ctx), jnp.asarray(empty), level,
                           batch_mask=jnp.asarray(bmask))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)
