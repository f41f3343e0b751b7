"""face_tools CLI smoke tests (tiny ArcFace)."""

import numpy as np
import pytest
from PIL import Image

from adaprompt_tpu.cli import face_tools


@pytest.fixture()
def folders(tmp_path):
    rng = np.random.default_rng(0)
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    for d in (a, b):
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)).save(d / f"i{i}.jpg")
    return str(a), str(b)


def test_compare_and_knn(folders, capsys, monkeypatch):
    a, b = folders
    # tiny ArcFace trunk for speed
    import jax
    from adaprompt_tpu.models import arcface
    from adaprompt_tpu.eval.face_eval import FaceSimilarityEvaluator
    tiny_cfg = arcface.IResNetConfig(layers=(1, 1, 1, 1), planes=(8, 16, 32, 64),
                                     num_features=32, input_size=112)
    tiny = FaceSimilarityEvaluator(arcface.init_params(jax.random.PRNGKey(0),
                                                       tiny_cfg), tiny_cfg)
    monkeypatch.setattr(face_tools, "_evaluator", lambda ckpt: tiny)

    face_tools.main(["compare", a, b])
    out = capsys.readouterr().out
    assert "avg face sim" in out

    q = f"{a}/i0.jpg"
    face_tools.main(["knn", q, b, "--k", "1"])
    out = capsys.readouterr().out
    assert ".jpg" in out
