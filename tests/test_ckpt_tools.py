"""ckpt_tools CLI tests."""

import numpy as np
import jax.numpy as jnp

from adaprompt_tpu.adaface import checkpoint as ckpt_mod
from adaprompt_tpu.cli import ckpt_tools


def test_average_checkpoints(tmp_path, capsys):
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    ckpt_mod.save_checkpoint(p1, {"m": {"w": jnp.ones((2,))}}, {"step": 1})
    ckpt_mod.save_checkpoint(p2, {"m": {"w": jnp.full((2,), 3.0)}}, {"step": 2})
    out = str(tmp_path / "avg.npz")
    ckpt_tools.main(["average", p1, p2, "--out", out])
    trees, meta = ckpt_mod.load_checkpoint(out)
    np.testing.assert_allclose(np.asarray(trees["m"]["w"]), 2.0)
    assert meta["averaged_from"] == [p1, p2]


def test_replace_component(tmp_path):
    base = str(tmp_path / "base.npz")
    donor = str(tmp_path / "donor.npz")
    np.savez(base, **{"first_stage_model.conv.weight": np.zeros((2, 2)),
                      "model.diffusion_model.x": np.ones((3,))})
    np.savez(donor, **{"first_stage_model.conv.weight": np.ones((2, 2))})
    out = str(tmp_path / "out.npz")
    ckpt_tools.main(["replace-vae", "--base", base, "--donor", donor, "--out", out])
    data = np.load(out)
    np.testing.assert_allclose(data["first_stage_model.conv.weight"], 1.0)
    np.testing.assert_allclose(data["model.diffusion_model.x"], 1.0)


def test_inspect(tmp_path, capsys):
    p = str(tmp_path / "c.npz")
    ckpt_mod.save_checkpoint(p, {"m": {"w": jnp.ones((2, 3))}}, {})
    ckpt_tools.main(["inspect", p])
    out = capsys.readouterr().out
    assert "m/w" in out and "(2, 3)" in out
