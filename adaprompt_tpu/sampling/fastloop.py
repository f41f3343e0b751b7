"""Generic segmented DeepCache / CFG-tail sampling-loop driver.

Factors the serving fast-path structure out of the individual solvers so
DDIM (sampling/ddim.py) and DPM-Solver++(2M) (sampling/dpm.py) share one
implementation of:

  * DeepCache deep-feature reuse (arXiv:2312.00858): one FULL UNet pass
    every `cache_interval` steps (uniformly across the segment), shallow
    cache-resume passes in between. Loop structure is picked per segment
    (round-5 chip A/B): a scan over groups when the interval divides the
    segment, else ONE scan with a static full/shallow flag + lax.cond —
    which removes the remainder executables whose overhead caused the
    round-4 "fast(all) anomaly" (docs/PERF.md),
  * CFG tail truncation (guidance-interval family, arXiv:2404.07724):
    the first `n_cfg` steps run the doubled (cond|uncond) CFG batch, the
    remaining steps run condition-only — two segments with different
    model batch shapes, each compiled once.

Both are approximations of the exact samplers and are opt-in everywhere
(pipeline.FastConfig); no reference counterpart exists (the reference
serves plain DDIM-50, /root/reference/ldm/models/diffusion/ddim.py).

The solver plugs in as a pure `update(carry, e_t, ps) -> carry` step:
`carry` is the solver state pytree whose FIRST element is the latent x
(DDIM: `(x,)`; DPM++(2M): `(x, x0_prev, h_prev)`), `ps` is the tuple of
this step's per-step values with ps[0] = ddpm timestep and ps[1] = the
CFG guidance scale (driver convention; further entries are solver-owned).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Loop-structure policy for non-dividing (steps, interval) segments:
# "group" (default) = group scan + separate remainder executables,
# "cond" = one flag+lax.cond scan. Round-5 same-day chip A/B
# (docs/PERF.md): group wins EVERYWHERE (dpmpp20+all 3.98 vs 3.55,
# +aggr 4.32 vs 3.65, +mild 3.55 vs 2.87 img/s) — the round-4 "fast(all)
# anomaly" that motivated the cond structure was day-to-day slice noise,
# not remainder-executable overhead. Read at trace time so probes can A/B
# by patching.
_COND_POLICY = os.environ.get("ADAPROMPT_FASTLOOP_COND", "group")


def fast_cached_loop(model_full, model_shallow, carry, arrs, update, *,
                     cache_interval: int = 1, n_cfg: int | None = None):
    """Run a segmented DeepCache/CFG-tail denoise loop.

    Args:
      model_full: (x_in, t_in) -> (eps, deep_cache); must accept both the
        doubled CFG batch and the plain batch (cond context first).
      model_shallow: (x_in, t_in, deep_cache) -> eps.
      carry: initial solver state; carry[0] is the [B, H, W, C] latent.
      arrs: tuple of per-step arrays, all length S, in denoise order;
        arrs[0] = ddpm timesteps, arrs[1] = guidance scales (already
        tail-pinned to 1 by the caller when cfg truncation is on).
      update: solver step `update(carry, e_t, ps) -> carry`.
      cache_interval: 1 = full pass every step (no caching).
      n_cfg: number of leading steps run with CFG; the rest run cond-only.
        None = all steps.

    Returns the final carry.
    """
    b = carry[0].shape[0]
    total = int(arrs[0].shape[0])
    if n_cfg is None:
        n_cfg = total

    def eps_full(x, ps, use_cfg):
        t, g = ps[0], ps[1]
        tb = jnp.full((b,), t, dtype=jnp.int32)
        if use_cfg:
            e_all, cache = model_full(jnp.concatenate([x, x], 0),
                                      jnp.concatenate([tb, tb], 0))
            e_c, e_u = jnp.split(e_all, 2, axis=0)
            return e_u + g.astype(x.dtype) * (e_c - e_u), cache
        return model_full(x, tb)

    def eps_shallow(x, ps, cache, use_cfg):
        t, g = ps[0], ps[1]
        tb = jnp.full((b,), t, dtype=jnp.int32)
        if use_cfg:
            e_all = model_shallow(jnp.concatenate([x, x], 0),
                                  jnp.concatenate([tb, tb], 0), cache)
            e_c, e_u = jnp.split(e_all, 2, axis=0)
            return e_u + g.astype(x.dtype) * (e_c - e_u)
        return model_shallow(x, tb, cache)

    def segment(carry, seg_arrs, use_cfg):
        n = int(seg_arrs[0].shape[0])
        if n == 0:
            return carry
        interval = max(int(cache_interval), 1)

        def full_step(carry, ps):
            e_t, cache = eps_full(carry[0], ps, use_cfg)
            return update(carry, e_t, ps), cache

        if interval == 1:
            # no caching: plain full-pass scan, shallow branch never built
            def body(carry, ps):
                return full_step(carry, ps)[0], None
            carry, _ = jax.lax.scan(body, carry, seg_arrs)
            return carry

        g_cnt, rem = divmod(n, interval)

        def shallow_body(sc, ps):
            carry, cache = sc
            e_t = eps_shallow(carry[0], ps, cache, use_cfg)
            return (update(carry, e_t, ps), cache), None

        cache0 = jax.eval_shape(
            lambda c: full_step(c, tuple(a[0] for a in seg_arrs)), carry)[1]
        cache0 = jnp.zeros(cache0.shape, cache0.dtype)

        # Two loop structures, picked by whether the interval divides the
        # segment (round-5 chip A/B, docs/PERF.md):
        #  * rem == 0: scan over groups of `interval` (full head + interior
        #    shallow scan) — the fastest structure, but when rem > 0 it
        #    needs separate remainder executables whose overhead eats the
        #    saved UNet passes (round-4 "fast(all) anomaly");
        #  * rem > 0: ONE scan over all n steps with a static per-step
        #    full/shallow flag via lax.cond — measured 10-18% SLOWER than
        #    the group scan on dividing configs but ~10% FASTER than
        #    group-scan + remainder executables on non-dividing ones.
        if rem == 0 or _COND_POLICY == "group":
            head_n = g_cnt * interval
            head = tuple(a[:head_n].reshape(g_cnt, interval, *a.shape[1:])
                         for a in seg_arrs)

            def group_body(sc, grp):
                carry, _ = sc
                first = tuple(a[0] for a in grp)
                carry, cache = full_step(carry, first)
                (carry, cache), _ = jax.lax.scan(
                    shallow_body, (carry, cache),
                    tuple(a[1:] for a in grp))
                return (carry, cache), None

            (carry, cache), _ = jax.lax.scan(group_body, (carry, cache0),
                                             head)
            if rem:
                # uniform-interval semantics: the remainder opens with a
                # full pass (flag j % interval == 0 at j = head_n), then
                # shallow — matches the cond path and the python oracle
                carry, cache = full_step(
                    carry, tuple(a[head_n] for a in seg_arrs))
                (carry, _), _ = jax.lax.scan(
                    shallow_body, (carry, cache),
                    tuple(a[head_n + 1:] for a in seg_arrs))
            return carry

        flags = jnp.asarray(
            [i % interval == 0 for i in range(n)], jnp.bool_)

        def body(sc, xs):
            carry, cache = sc
            is_full, ps = xs[0], xs[1:]

            def do_full(carry, cache):
                return full_step(carry, ps)

            def do_shallow(carry, cache):
                e_t = eps_shallow(carry[0], ps, cache, use_cfg)
                return update(carry, e_t, ps), cache

            carry, cache = jax.lax.cond(is_full, do_full, do_shallow,
                                        carry, cache)
            return (carry, cache), None

        (carry, _), _ = jax.lax.scan(body, (carry, cache0),
                                     (flags,) + seg_arrs)
        return carry

    carry = segment(carry, tuple(a[:n_cfg] for a in arrs), True)
    carry = segment(carry, tuple(a[n_cfg:] for a in arrs), False)
    return carry
