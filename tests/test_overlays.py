"""Background overlay ("wds") composition tests."""

import numpy as np
import pytest
from PIL import Image

from adaprompt_tpu.data import dataset as ds
from adaprompt_tpu.data.overlays import BackgroundOverlayProvider


@pytest.fixture()
def bg_dir(tmp_path):
    d = tmp_path / "bg"
    d.mkdir()
    rng = np.random.default_rng(0)
    # good sample
    Image.fromarray(rng.integers(0, 255, (600, 640, 3), dtype=np.uint8)).save(d / "a.jpg")
    (d / "a.txt").write_text("a mountain lake at sunset")
    # rejected: contains a human word
    Image.fromarray(rng.integers(0, 255, (600, 640, 3), dtype=np.uint8)).save(d / "b.jpg")
    (d / "b.txt").write_text("a man hiking a mountain")
    # rejected: too small (< size/1.3)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(d / "c.jpg")
    (d / "c.txt").write_text("a tiny background image here")
    return str(d)


def test_provider_filters_and_fits(bg_dir):
    prov = BackgroundOverlayProvider(bg_dir, size=64, seed=0)
    for _ in range(5):
        out = prov.sample()
        assert out is not None
        img, cap = out
        assert img.shape == (64, 64, 3)
        assert cap == "a mountain lake at sunset"


def test_dataset_with_overlays(tmp_path, bg_dir):
    root = tmp_path / "subjects" / "alice"
    root.mkdir(parents=True)
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(root / "i.jpg")
    m = np.zeros((64, 64), np.uint8)
    m[16:48, 16:48] = 255
    Image.fromarray(m).save(root / "i_mask.png")

    subjects = ds.scan_subject_folders(str(tmp_path / "subjects"))
    prov = BackgroundOverlayProvider(bg_dir, size=64, seed=0)
    d = ds.PersonalizedDataset(subjects, size=64, seed=0, scale_p=0.0,
                               overlay_provider=prov, overlay_prob=1.0)
    ex = d.sample(0)
    assert ex["has_wds_comp"]
    assert ex["wds_caption"].endswith(", in front of a mountain lake at sunset")
    assert "person" in ex["wds_cls_caption"]
    # fg pixels come from the subject image; bg pixels from the overlay
    wds = ex["wds_image"]
    img = ex["image"]
    fg = ex["fg_mask"].astype(bool)
    np.testing.assert_allclose(wds[fg], img[fg], atol=1e-6)
    assert not np.allclose(wds[~fg], img[~fg])


def test_tar_source(tmp_path, bg_dir):
    import tarfile
    tar_path = str(tmp_path / "bgs.tar")
    with tarfile.open(tar_path, "w") as tf:
        for f in ("a.jpg", "a.txt"):
            tf.add(f"{bg_dir}/{f}", arcname=f)
    prov = BackgroundOverlayProvider(tar_path, size=64, seed=0)
    out = prov.sample()
    assert out is not None and out[0].shape == (64, 64, 3)
