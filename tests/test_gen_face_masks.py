"""gen_face_masks CLI: BiSeNet parsing + the reference curation rules
(trash/inspect thresholds, 512px image + _mask.png outputs)."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

import test_bisenet as tb  # the independent torch BiSeNet construction

pytestmark = pytest.mark.slow


def test_gen_face_masks_cli(tmp_path, monkeypatch):
    torch.manual_seed(0)
    net = tb.BiSeNet().eval()
    ckpt = tmp_path / "bisenet.pth"
    torch.save(net.state_dict(), ckpt)

    src = tmp_path / "faces"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(
            src / f"img{i}.jpg")

    out = tmp_path / "masks"
    from adaprompt_tpu.cli import gen_face_masks as gfm
    # random weights give arbitrary part counts; disable curation so both
    # images flow through the mask-writing path
    gfm.main(["--bisenet_ckpt", str(ckpt), "--src", str(src),
              "--out", str(out), "--flat", "--batch_size", "2",
              "--trash_min_parts", "0", "--inspect_max_parts", "10000"])
    files = sorted(os.listdir(out))
    assert "img0.jpg" in files and "img0_mask.png" in files
    m = np.asarray(Image.open(out / "img0_mask.png"))
    assert m.shape == (512, 512)
    assert set(np.unique(m)).issubset({0, 255})
    img = np.asarray(Image.open(out / "img0.jpg"))
    assert img.shape == (512, 512, 3)


def test_curation_moves_bad_images(tmp_path):
    torch.manual_seed(0)
    net = tb.BiSeNet().eval()
    ckpt = tmp_path / "bisenet.pth"
    torch.save(net.state_dict(), ckpt)
    src = tmp_path / "faces2"
    src.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        src / "a.jpg")
    out = tmp_path / "masks2"
    from adaprompt_tpu.cli import gen_face_masks as gfm
    # force every image to be "trash" (<= 10000 parts)
    gfm.main(["--bisenet_ckpt", str(ckpt), "--src", str(src),
              "--out", str(out), "--flat", "--trash_min_parts", "10000"])
    trash = str(src) + "_trash"
    assert os.path.exists(os.path.join(trash, "a.jpg"))
    assert not os.path.exists(out / "a.jpg")
