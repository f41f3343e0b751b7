"""Parity: elastic-matching losses vs the reference oracles."""

import numpy as np
import torch
import jax.numpy as jnp

from adaprompt_tpu.train import elastic as je

import torch_oracle


def test_calc_elastic_matching_loss_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(0)
    N, C = 64, 32
    ca_q = rng.standard_normal((4, C, N)).astype(np.float32) * 0.2
    ca_feat = rng.standard_normal((4, C, N)).astype(np.float32)
    fg = (rng.random((1, 1, N)) > 0.5).astype(np.float32)

    with torch.no_grad():
        ref = lutil.calc_elastic_matching_loss(
            torch.tensor(ca_q), torch.tensor(ca_feat), torch.tensor(fg),
            fg_bg_cutoff_prob=0.25, single_q_grad_scale=0.1,
            single_feat_grad_scale=0.01, mix_feat_grad_scale=0.05)
    got = je.calc_elastic_matching_loss(jnp.asarray(ca_q), jnp.asarray(ca_feat),
                                        jnp.asarray(fg))
    for i in range(3):  # the three scalar losses
        np.testing.assert_allclose(float(got[i]), float(ref[i]),
                                   atol=1e-5, rtol=1e-3)
    # bg prob maps
    np.testing.assert_allclose(np.asarray(got[3]), ref[3].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[4]), ref[4].numpy(), atol=1e-5)


def test_comp_fg_bg_preserve_loss_parity():
    ddpm_mod = torch_oracle.load("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(1)
    layers = [7, 24]
    hw = {7: 8, 24: 16}
    ch = {7: 16, 24: 8}
    heads, S = 4, 13
    SUBJ_POS = [4, 5, 6]

    outfeats_t, qs_t, attns_t = {}, {}, {}
    outfeats_j, qs_j, attns_j = {}, {}, {}
    for li in layers:
        h = hw[li]
        of = rng.standard_normal((4, ch[li], h, h)).astype(np.float32)
        q = (rng.standard_normal((4, heads, h * h, ch[li] // heads)) * 0.3).astype(np.float32)
        at = (rng.random((4, heads, h * h, S)) * 2 - 1).astype(np.float32)
        outfeats_t[li] = torch.tensor(of)
        qs_t[li] = torch.tensor(q)
        attns_t[li] = torch.tensor(at)
        outfeats_j[li] = jnp.asarray(of.transpose(0, 2, 3, 1))
        qs_j[li] = jnp.asarray(q)
        attns_j[li] = jnp.asarray(at)

    fg = np.zeros((1, 32, 32), np.float32)
    fg[:, 8:24, 8:24] = 1
    subj_indices = (torch.tensor([0] * 3 + [1] * 3 + [2] * 3 + [3] * 3),
                    torch.tensor(SUBJ_POS * 4))
    with torch.no_grad():
        ref = ddpm_mod.LatentDiffusion.calc_comp_fg_bg_preserve_loss(
            None, outfeats_t, None, qs_t, None, attns_t,
            torch.tensor(fg[:, None]), torch.tensor([1.0]), subj_indices, 1)
    got, stats = je.calc_comp_fg_bg_preserve_loss(
        outfeats_j, qs_j, attns_j, jnp.asarray(fg[..., None]), SUBJ_POS, 1,
        normalize_q_outfeat=False)
    assert not stats
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), atol=1e-4, rtol=2e-3)

    # normalized variant: ca_q_bns (train-mode affine-free BatchNorm) +
    # ca_outfeat_lns (affine-free LayerNorm), ddpm.py:3295-3300
    ca_q_bns = {str(li): torch.nn.BatchNorm2d(ch[li], affine=False)
                for li in layers}
    ca_outfeat_lns = {str(li): torch.nn.LayerNorm(ch[li],
                                                  elementwise_affine=False)
                      for li in layers}
    with torch.no_grad():
        ref_n = ddpm_mod.LatentDiffusion.calc_comp_fg_bg_preserve_loss(
            None, outfeats_t, ca_outfeat_lns, qs_t, ca_q_bns, attns_t,
            torch.tensor(fg[:, None]), torch.tensor([1.0]), subj_indices, 1)
    got_n, stats = je.calc_comp_fg_bg_preserve_loss(
        outfeats_j, qs_j, attns_j, jnp.asarray(fg[..., None]), SUBJ_POS, 1,
        normalize_q_outfeat=True)
    for r, g in zip(ref_n, got_n):
        np.testing.assert_allclose(float(g), float(r), atol=1e-4, rtol=2e-3)
    # exported batch stats match the torch BNs' updated running stats
    # (momentum 0.1 from a fresh init: running = 0.9*init + 0.1*batch)
    for li in layers:
        m, v = np.asarray(stats[li][0]), np.asarray(stats[li][1])
        np.testing.assert_allclose(ca_q_bns[str(li)].running_mean.numpy(),
                                   0.1 * m, atol=1e-5)
        np.testing.assert_allclose(ca_q_bns[str(li)].running_var.numpy(),
                                   0.9 + 0.1 * v, atol=1e-5, rtol=1e-4)
