"""PersonalizedBase-equivalent dataset: subject folders with fg masks,
mask-aware augmentation, per-sample prompt sets, and subject-pinned batch
sampling.

Re-architecture of /root/reference/ldm/data/personalized.py:130-1043:
  * folder scan: one folder per subject; `*_mask.png` files are foreground
    masks of the same-stem image (personalized.py:179-300);
  * __getitem__: image + mask stacked to 4 channels, NEAREST resize to
    `size`, random horizontal flip, 50%-probability random downscale
    (0.7-1.0) pasted on a black canvas producing an `aug_mask`, followed by
    a random shift within the empty margins (margin 12px)
    (personalized.py:510-698);
  * generate_prompts: the 4-type prompt set (data/prompts.py);
  * SubjectSampler: every batch is drawn from ONE subject, subjects sampled
    proportionally to image count, non-face subjects skippable
    (personalized.py:1004-1043).

Host-side only (PIL/numpy) — tensors enter JAX at the train-step boundary.
"""

from __future__ import annotations

import dataclasses
import os
import random

import numpy as np
from PIL import Image

from adaprompt_tpu.data.prompts import generate_prompt_set

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


@dataclasses.dataclass
class SubjectInfo:
    name: str
    image_paths: list
    fg_mask_paths: list
    is_face: bool = True
    cls_delta_string: str = "person"
    broad_class: int = 1


def scan_subject_folders(data_roots, default_cls_delta_string: str = "person",
                         subject_names: list | None = None) -> list[SubjectInfo]:
    """Each immediate subfolder of each root is one subject; a root that
    itself contains images is a single subject."""
    if isinstance(data_roots, str):
        data_roots = [data_roots]
    subjects = []
    for root in data_roots:
        entries = sorted(os.listdir(root))
        subdirs = [e for e in entries if os.path.isdir(os.path.join(root, e))]
        folders = [(e, os.path.join(root, e)) for e in subdirs] or \
                  [(os.path.basename(os.path.normpath(root)), root)]
        for name, folder in folders:
            if subject_names is not None and name not in subject_names:
                continue
            imgs, masks = [], []
            for f in sorted(os.listdir(folder)):
                p = os.path.join(folder, f)
                stem, ext = os.path.splitext(f)
                if ext.lower() not in IMG_EXTENSIONS or stem.endswith("_mask"):
                    continue
                imgs.append(p)
                mask_p = os.path.join(folder, stem + "_mask.png")
                masks.append(mask_p if os.path.exists(mask_p) else None)
            if imgs:
                subjects.append(SubjectInfo(name, imgs, masks,
                                            cls_delta_string=default_cls_delta_string))
    return subjects


def _load_image_and_mask(image_path, mask_path, size, rng: random.Random,
                         flip_p: float = 0.5):
    img = Image.open(image_path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    image = np.asarray(img, np.uint8)
    if mask_path is not None:
        fg = np.asarray(Image.open(mask_path).convert("L"), np.uint8)
        has_fg_mask = True
    else:
        fg = np.full(image.shape[:2], 255, np.uint8)
        has_fg_mask = False
    stacked = np.concatenate([image, fg[..., None]], axis=-1)
    # NEAREST resize keeps the mask binary (personalized.py:600-606)
    stacked = np.asarray(Image.fromarray(stacked).resize((size, size),
                                                         Image.NEAREST))
    if rng.random() < flip_p:
        stacked = stacked[:, ::-1]
    return stacked, has_fg_mask


def _random_scale_shift(stacked, rng: random.Random, scale_range=(0.7, 1.0),
                        margin: int = 12):
    """Random downscale pasted on a black canvas + shift within empty
    margins; returns (stacked, aug_mask) (personalized.py:620-680)."""
    size = stacked.shape[0]
    s = rng.uniform(*scale_range)
    new = max(8, int(round(size * s)))
    small = np.asarray(Image.fromarray(stacked).resize((new, new), Image.NEAREST))
    canvas = np.zeros_like(stacked)
    aug = np.zeros(stacked.shape[:2], np.uint8)
    off = (size - new) // 2
    canvas[off:off + new, off:off + new] = small
    aug[off:off + new, off:off + new] = 1

    top0 = bottom0 = left0 = right0 = off
    dy = dx = 0
    if top0 + bottom0 > 2 * margin:
        dy = rng.randint(0, top0 + bottom0 - 2 * margin)
        if dy > bottom0 - margin:
            dy = -(dy - bottom0 + margin)
    if left0 + right0 > 2 * margin:
        dx = rng.randint(0, left0 + right0 - 2 * margin)
        if dx > right0 - margin:
            dx = -(dx - right0 + margin)
    canvas = np.roll(canvas, (dy, dx), axis=(0, 1))
    aug = np.roll(aug, (dy, dx), axis=(0, 1))
    return canvas, aug


class PersonalizedDataset:
    def __init__(self, subjects: list[SubjectInfo], size: int = 512,
                 flip_p: float = 0.5, scale_p: float = 0.5,
                 subject_string: str = "z", background_string: str | None = "y",
                 num_vectors_per_subj_token: int = 16,
                 num_vectors_per_bg_token: int = 4,
                 num_compositions_per_image: int = 1,
                 seed: int | None = None,
                 overlay_provider=None, overlay_prob: float = 0.0):
        assert subjects, "no subjects found"
        self.overlay_provider = overlay_provider
        self.overlay_prob = overlay_prob
        self.subjects = subjects
        self.size = size
        self.flip_p = flip_p
        self.scale_p = scale_p
        self.subject_string = subject_string
        self.background_string = background_string
        self.num_vectors_per_subj_token = num_vectors_per_subj_token
        self.num_vectors_per_bg_token = num_vectors_per_bg_token
        self.num_compositions_per_image = num_compositions_per_image
        self.rng = random.Random(seed)

    @property
    def num_images(self):
        return sum(len(s.image_paths) for s in self.subjects)

    def sample(self, subject_idx: int, rng: random.Random | None = None) -> dict:
        """rng overrides the dataset RNG — each loader worker passes its own
        (the reference's worker_init_fn reseeding, main.py:396-409)."""
        rng = rng or self.rng
        subj = self.subjects[subject_idx]
        i = rng.randrange(len(subj.image_paths))
        stacked, has_fg_mask = _load_image_and_mask(
            subj.image_paths[i], subj.fg_mask_paths[i], self.size, rng,
            self.flip_p)
        if rng.random() < self.scale_p:
            stacked, aug_mask = _random_scale_shift(stacked, rng)
        else:
            aug_mask = np.ones(stacked.shape[:2], np.uint8)

        image = stacked[..., :3]
        fg_mask = (stacked[..., 3] / 255.0 > 0.5).astype(np.uint8)

        ex = {
            "image": image.astype(np.float32) / 127.5 - 1.0,   # [-1, 1]
            "image_unnorm": image,
            "fg_mask": fg_mask,
            "aug_mask": aug_mask,
            "has_fg_mask": has_fg_mask,
            "image_path": subj.image_paths[i],
            "subject_name": subj.name,
            "is_face": subj.is_face,
        }
        ex.update(generate_prompt_set(
            self.subject_string, subj.cls_delta_string,
            background_string=self.background_string,
            cls_bg_delta_string="background" if self.background_string else None,
            num_vectors_per_subj_token=self.num_vectors_per_subj_token,
            num_vectors_per_bg_token=self.num_vectors_per_bg_token,
            broad_class=subj.broad_class, is_animal=True,
            num_compositions_per_image=self.num_compositions_per_image,
            rng=rng))

        # optional background overlay composition (the reference's wds path,
        # personalized.py:721-830)
        ex["has_wds_comp"] = False
        ex["wds_caption"] = ex["caption"]
        ex["wds_caption_bg"] = ex["caption_bg"]
        ex["wds_comp_extra"] = ""
        if (self.overlay_provider is not None
                and rng.random() < self.overlay_prob):
            from adaprompt_tpu.data.overlays import composite_wds_example
            bg = self.overlay_provider.sample()
            if bg is not None:
                ex = composite_wds_example(ex, bg[0], bg[1], subj.cls_delta_string)
        return ex


class SubjectSampler:
    """Subject indices for batches; each batch is one subject, sampled
    proportionally to image count; non-face subjects skipped by default."""

    def __init__(self, subjects: list[SubjectInfo], skip_non_faces: bool = True,
                 seed: int | None = None):
        self.subjects = subjects
        self.skip_non_faces = skip_non_faces
        counts = np.array([len(s.image_paths) for s in subjects], np.float64)
        self.weights = counts / counts.sum()
        self.rng = np.random.default_rng(seed)

    def next_subject(self) -> int:
        while True:
            idx = int(self.rng.choice(len(self.subjects), p=self.weights))
            if not self.skip_non_faces or self.subjects[idx].is_face:
                return idx


def _collate(examples: list, subj_idx: int) -> dict:
    batch = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        batch[k] = vals if isinstance(vals[0], (str, bool)) else np.stack(vals)
    batch["subject_idx"] = subj_idx
    return batch


def make_batch_iterator(dataset: PersonalizedDataset, sampler: SubjectSampler,
                        batch_size: int, num_workers: int = 0,
                        prefetch: int = 4):
    """Yields collated numpy batches; one subject per batch (the
    SubjectSampler contract).

    num_workers > 0 runs the PIL decode/augment pipeline in a thread pool
    with a bounded prefetch queue (the reference's multi-worker DataLoader,
    main.py:414-512) so the accelerator never waits on image IO. Thread
    (not process) workers suffice: the decode path is PIL/numpy, which
    releases the GIL for the heavy ops. Batch order is deterministic for a
    fixed sampler seed regardless of num_workers (subject indices are drawn
    on the producer side in order)."""
    if num_workers <= 0:
        while True:
            subj_idx = sampler.next_subject()
            yield _collate([dataset.sample(subj_idx)
                            for _ in range(batch_size)], subj_idx)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    pool_sem = threading.Semaphore(num_workers)
    stop = threading.Event()

    def make_batch(subj_idx, seed):
        try:
            rng = random.Random(seed)  # per-batch rng: no cross-thread races
            return _collate([dataset.sample(subj_idx, rng=rng)
                             for _ in range(batch_size)], subj_idx)
        finally:
            pool_sem.release()

    def producer():
        import concurrent.futures as cf
        base_seed = dataset.rng.randrange(2 ** 31)
        counter = 0
        with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
            while not stop.is_set():
                pool_sem.acquire()
                if stop.is_set():
                    break
                subj_idx = sampler.next_subject()
                fut = ex.submit(make_batch, subj_idx, base_seed + counter)
                counter += 1
                q.put(fut)  # futures queued in order -> deterministic order

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            yield q.get().result()
    finally:
        stop.set()
        pool_sem.release()
        while not q.empty():  # drain so the producer can exit
            try:
                q.get_nowait()
            except queue.Empty:
                break
