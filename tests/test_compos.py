"""Parity: adaprompt_tpu.train.compos vs the reference mix/distill machinery
(ldm/util.py mix_static_vk_embeddings etc., ddpm.calc_prompt_mix_loss)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from adaprompt_tpu.train import compos as jc

import torch_oracle

L, B, S, D = 16, 2, 11, 8
SUBJ_POS = [4, 5, 6]


def test_mix_static_vk_embeddings_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(0)
    subj = rng.standard_normal((L, B, S, D)).astype(np.float32)
    cls_ = rng.standard_normal((L, B, S, D)).astype(np.float32)
    t_frac = np.array([0.9, 0.6], np.float32)
    training_percent = 0.4

    # reference layout: [B*L, S, D] batch-major, subj and cls concatenated
    subj_t = torch.tensor(subj.transpose(1, 0, 2, 3).reshape(B * L, S, D))
    cls_t = torch.tensor(cls_.transpose(1, 0, 2, 3).reshape(B * L, S, D))
    c_static = torch.cat([subj_t, cls_t], dim=0)
    subj_indices = (torch.zeros(len(SUBJ_POS), dtype=torch.long),
                    torch.tensor(SUBJ_POS))
    with torch.no_grad():
        c_vk, *_ = lutil.mix_static_vk_embeddings(
            c_static, subj_indices[1], training_percent,
            t_frac=torch.tensor(t_frac))
    # second half = the mix embeddings: [B*L, 2S, D]
    ref_mix = c_vk[B * L:].numpy().reshape(B, L, 2 * S, D).transpose(1, 0, 2, 3)
    ref_v, ref_k = ref_mix[:, :, :S], ref_mix[:, :, S:]
    # first half = subject embeddings repeated over the token dim
    ref_subj = c_vk[:B * L].numpy().reshape(B, L, 2 * S, D).transpose(1, 0, 2, 3)
    np.testing.assert_allclose(ref_subj[:, :, :S], subj, atol=1e-6)

    mix_v, mix_k = jc.mix_static_vk_embeddings(
        jnp.asarray(subj), jnp.asarray(cls_), SUBJ_POS,
        jnp.asarray(t_frac), training_percent)
    np.testing.assert_allclose(np.asarray(mix_v), ref_v, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mix_k), ref_k, atol=1e-5, rtol=1e-4)


def test_convert_attn_to_spatial_weight_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(1)
    flat = rng.random((2, 8, 256)).astype(np.float32)  # [bs*occ, heads, Q]
    with torch.no_grad():
        ref_w, ref_a = lutil.convert_attn_to_spatial_weight(
            torch.tensor(flat), 1, torch.Size((16, 16)), reversed=True)
    got_w, got_a = jc.convert_attn_to_spatial_weight(jnp.asarray(flat), 1,
                                                     (16, 16))
    np.testing.assert_allclose(np.asarray(got_w)[..., 0], ref_w.numpy()[:, 0],
                               atol=1e-4, rtol=1e-3)


def test_calc_prompt_mix_loss_parity():
    ddpm_mod = torch_oracle.load("ldm.models.diffusion.ddpm")
    rng = np.random.default_rng(2)
    layers = [7, 8, 24]
    hw = {7: 8, 8: 8, 24: 16}
    ch = {7: 16, 8: 16, 24: 8}
    heads = 4
    outfeats_t, attns_t = {}, {}
    outfeats_j, attns_j = {}, {}
    for li in layers:
        h = hw[li]
        of = rng.standard_normal((4, ch[li], h, h)).astype(np.float32)
        at = (rng.random((4, heads, h * h, S)) * 2 - 1).astype(np.float32)
        outfeats_t[li] = torch.tensor(of)
        attns_t[li] = torch.tensor(at)
        outfeats_j[li] = jnp.asarray(of.transpose(0, 2, 3, 1))
        attns_j[li] = jnp.asarray(at)

    fg_indices_2b = (torch.tensor([0, 0, 0, 1, 1, 1]),
                     torch.tensor(SUBJ_POS * 2))
    with torch.no_grad():
        ref = ddpm_mod.LatentDiffusion.calc_prompt_mix_loss(
            None, outfeats_t, None, attns_t, fg_indices_2b, 1)
    got = jc.calc_prompt_mix_loss(outfeats_j, attns_j, SUBJ_POS, 1)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), atol=1e-4, rtol=1e-3)

    # normalize_outfeat=1: affine-free LN on outfeats (ddpm.py:3379-3384)
    ca_outfeat_lns = {str(li): torch.nn.LayerNorm(ch[li],
                                                  elementwise_affine=False)
                      for li in layers}
    with torch.no_grad():
        ref_n = ddpm_mod.LatentDiffusion.calc_prompt_mix_loss(
            None, outfeats_t, ca_outfeat_lns, attns_t, fg_indices_2b, 1)
    got_n = jc.calc_prompt_mix_loss(outfeats_j, attns_j, SUBJ_POS, 1,
                                    normalize_outfeat=1.0)
    for r, g in zip(ref_n, got_n):
        np.testing.assert_allclose(float(g), float(r), atol=1e-4, rtol=1e-3)


def test_clip_teachability():
    import numpy as np
    t = jc.clip_teachability(jnp.asarray([0.2, 0.3, 0.27]),
                             jnp.asarray([0.25, 0.35, 0.27]))
    np.testing.assert_array_equal(np.asarray(t), [True, False, False])


def test_select_teachable_candidate_reference_semantics():
    """Scripted-scorer reproduction of the reference's teachable decisions
    (calc_clip_losses, ddpm.py:3649-3681)."""
    from adaprompt_tpu.train.compos import select_teachable_candidate

    # neither candidate qualifies: cls loss above 0.28
    ok, _ = select_teachable_candidate([0.40, 0.41], [0.30, 0.35])
    assert not ok
    # margin must exceed 0.002 (subj loss must be WORSE than cls)
    ok, _ = select_teachable_candidate([0.2700, 0.2701], [0.270, 0.270])
    assert not ok
    # candidate 1 qualifies with the larger margin
    ok, best = select_teachable_candidate([0.30, 0.35], [0.27, 0.25])
    assert ok and best == 1
    # the larger-margin candidate is NOT teachable (cls too high) -> pick
    # the teachable one even though its margin is smaller
    ok, best = select_teachable_candidate([0.50, 0.30], [0.30, 0.27])
    assert ok and best == 1
    # single-candidate (reuse-iteration) path
    ok, best = select_teachable_candidate([0.30], [0.27])
    assert ok and best == 0
