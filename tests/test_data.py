"""Data pipeline tests using a synthetic subject folder tree."""

import numpy as np
import pytest
from PIL import Image

from adaprompt_tpu.data import dataset as ds
from adaprompt_tpu.data import prompts as dp


@pytest.fixture(scope="module")
def subject_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("subjects")
    rng = np.random.default_rng(0)
    for name, n in [("alice", 3), ("bob", 2)]:
        d = root / name
        d.mkdir()
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"img{i}.jpg")
            mask = np.zeros((64, 64), np.uint8)
            mask[16:48, 16:48] = 255
            Image.fromarray(mask).save(d / f"img{i}_mask.png")
    return str(root)


def test_scan_subject_folders(subject_tree):
    subjects = ds.scan_subject_folders(subject_tree)
    assert [s.name for s in subjects] == ["alice", "bob"]
    assert len(subjects[0].image_paths) == 3
    assert all(m is not None for m in subjects[0].fg_mask_paths)


def test_sample_fields_and_masks(subject_tree):
    subjects = ds.scan_subject_folders(subject_tree)
    d = ds.PersonalizedDataset(subjects, size=32, seed=0)
    ex = d.sample(0)
    assert ex["image"].shape == (32, 32, 3)
    assert ex["image"].min() >= -1.0 and ex["image"].max() <= 1.0
    assert set(np.unique(ex["fg_mask"])) <= {0, 1}
    assert set(np.unique(ex["aug_mask"])) <= {0, 1}
    # 4-type prompt keys
    for k in ("caption", "caption_bg", "subj_prompt_single", "cls_prompt_single",
              "subj_prompt_comp", "cls_prompt_comp", "subj_prompt_single_fp",
              "cls_prompt_comp_fp"):
        assert k in ex, k
    assert "z" in ex["subj_prompt_single"]
    assert "person" in ex["cls_prompt_single"]
    # aug_mask masks the image: outside aug area the image must be black
    img = (ex["image"] + 1) * 127.5
    outside = img[ex["aug_mask"] == 0]
    assert outside.size == 0 or outside.max() <= 1.0


def test_subject_sampler_weights_and_faces(subject_tree):
    subjects = ds.scan_subject_folders(subject_tree)
    subjects[1].is_face = False
    sampler = ds.SubjectSampler(subjects, skip_non_faces=True, seed=0)
    draws = {sampler.next_subject() for _ in range(20)}
    assert draws == {0}


def test_batch_iterator_single_subject(subject_tree):
    subjects = ds.scan_subject_folders(subject_tree)
    d = ds.PersonalizedDataset(subjects, size=32, seed=1)
    it = ds.make_batch_iterator(d, ds.SubjectSampler(subjects, seed=1), batch_size=3)
    batch = next(it)
    assert batch["image"].shape == (3, 32, 32, 3)
    assert len(set(batch["subject_name"])) == 1  # one subject per batch


def test_sample_compositions_shapes():
    comps = dp.sample_compositions(5, "animal", is_training=True)
    assert len(comps) == 5
    assert all(isinstance(c, str) and c for c in comps)
    comps_inf = dp.sample_compositions(3, "object", is_training=False)
    assert len(comps_inf) == 3


def test_multi_vector_placeholder_expansion():
    ex = dp.generate_prompt_set("z", "person", background_string="y",
                                cls_bg_delta_string="grass",
                                num_vectors_per_subj_token=9,
                                num_vectors_per_bg_token=4)
    assert ex["caption"].count(",") >= 8
    assert "y, , , " in ex["caption_bg"]
