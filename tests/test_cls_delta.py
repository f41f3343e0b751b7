"""Parity: adaprompt_tpu.adaface.cls_delta vs ldm/util.py oracles."""

import numpy as np
import torch
import jax.numpy as jnp

from adaprompt_tpu.adaface import cls_delta as cd

import torch_oracle


def test_scan_cls_delta_strings_parity():
    lutil = torch_oracle.load("ldm.util")
    # batch of 4: first half has subject token 500 at pos 4/5; second half
    # has the class tokens [70, 71] near those positions
    tt = np.full((4, 12), 7, np.int64)
    tt[0, 4] = 500
    tt[1, 5] = 500
    tt[2, 5:7] = [70, 71]
    tt[3, 5:7] = [70, 71]
    ph = (torch.tensor([0, 1]), torch.tensor([4, 5]))
    mapping = {"alice": torch.tensor([70, 71])}
    ref = lutil.scan_cls_delta_strings(torch.tensor(tt), ph, mapping, 5)
    got = cd.scan_cls_delta_strings(tt, [0, 1], [4, 5], {"alice": [70, 71]}, 5)
    assert [tuple(r) for r in ref] == got


def test_merge_cls_token_embeddings_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((4, 12, 8)).astype(np.float32)
    indices = [(2, 5, 2, "alice"), (3, 5, 2, "alice")]
    weights = {"alice": torch.tensor([1.0, 2.0])}
    with torch.no_grad():
        ref = lutil.merge_cls_token_embeddings(torch.tensor(emb), indices, weights)
    got = cd.merge_cls_token_embeddings(jnp.asarray(emb), indices,
                                        {"alice": [1.0, 2.0]})
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)


def test_distribute_embedding_parity():
    lutil = torch_oracle.load("ldm.util")
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((2, 10, 8)).astype(np.float32)
    pos = [3, 4, 5]
    with torch.no_grad():
        ref = lutil.distribute_embedding_to_M_tokens(torch.tensor(emb),
                                                     torch.tensor(pos))
    got = cd.distribute_embedding_to_M_tokens(jnp.asarray(emb), pos)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)
