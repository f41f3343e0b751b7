"""Checkpoint roundtrip + reference .pt loading tests."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from adaprompt_tpu.adaface import checkpoint as ckpt_mod
from adaprompt_tpu.adaface import zs_features
from adaprompt_tpu.models import clip_vision


def test_npz_roundtrip(tmp_path):
    tree = {"a": {"kernel": jnp.ones((2, 3)), "layers": [
        {"w": jnp.zeros((4,))}, {"w": jnp.full((4,), 2.0)}]}}
    p = str(tmp_path / "ck.npz")
    ckpt_mod.save_checkpoint(p, {"model": tree}, meta={"step": 7})
    trees, meta = ckpt_mod.load_checkpoint(p)
    assert meta["step"] == 7
    np.testing.assert_allclose(np.asarray(trees["model"]["a"]["kernel"]), 1.0)
    assert isinstance(trees["model"]["a"]["layers"], list)
    np.testing.assert_allclose(np.asarray(trees["model"]["a"]["layers"][1]["w"]), 2.0)


def test_load_reference_style_checkpoint(tmp_path, monkeypatch):
    """Create a reference-style .pt (pickled nn.Modules under the adaface
    namespace) and load it without the reference code."""
    import torch.nn as nn
    import torch_oracle
    torch_oracle.load("adaface.subj_basis_generator")  # ensures namespace exists

    class FakeSBG(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_embs = nn.Parameter(torch.randn(1, 4, 8))
            self.proj = nn.Linear(8, 8)

    # register under the reference namespace (any adaface.* class is mapped
    # to a skeleton by the loader; use a fresh attribute name so the real
    # reference class is untouched)
    import sys
    FakeSBG.__module__ = "adaface.subj_basis_generator"
    FakeSBG.__qualname__ = FakeSBG.__name__ = "SubjBasisGeneratorForTest"
    setattr(sys.modules["adaface.subj_basis_generator"], "SubjBasisGeneratorForTest", FakeSBG)

    sbg = FakeSBG()
    ckpt = {
        "string_to_subj_basis_generator_dict": nn.ModuleDict({"z": sbg}),
        "string_to_token_dict": {"z": 49408},
        "emb_global_scale_scores": torch.zeros(2),
    }
    p = str(tmp_path / "embeddings_gs-100.pt")
    torch.save(ckpt, p)

    out = ckpt_mod.load_reference_checkpoint(p)
    sd = out["subj_basis_generators"]["z"]
    np.testing.assert_allclose(sd["pos_embs"], sbg.pos_embs.detach().numpy())
    np.testing.assert_allclose(sd["proj.weight"], sbg.proj.weight.detach().numpy())
    assert out["string_to_token"]["z"] == 49408
    assert "emb_global_scale_scores" in out["raw"]


def test_zs_feature_extraction_shapes():
    cfg = clip_vision.CLIPVisionConfig(image_size=32, patch_size=8,
                                       hidden_size=64, intermediate_size=128,
                                       num_layers=2, num_heads=4,
                                       projection_dim=32)
    params = clip_vision.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (48, 48, 3), dtype=np.uint8) for _ in range(2)]
    masks = [np.zeros((48, 48), np.float32) for _ in range(2)]
    for m in masks:
        m[10:30, 10:30] = 1
    ex = zs_features.ZeroShotFeatureExtractor(params, cfg)
    feats, id_embs, faceless = ex(imgs, masks, is_face=False)
    s = cfg.num_patches + 1
    assert feats.shape == (2, 2 * s, 64)
    avg_feats, _, _ = ex(imgs, masks, is_face=False, calc_avg=True)
    assert avg_feats.shape == (1, 2 * s, 64)
