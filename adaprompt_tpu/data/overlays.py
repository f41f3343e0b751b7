"""Background-overlay composition ("wds" overlays).

Role of the webdataset overlay path in the reference dataset
(/root/reference/ldm/data/personalized.py:721-830): a stream of
(background image, caption) pairs is filtered (caption long enough, no
humans/animals, no special tokens, acceptable aspect/size), center-fit to
the training resolution, and the subject's foreground is pasted over the
background; the prompts gain an ", in front of <bg caption>" suffix.

Source-agnostic: a directory of images with sidecar .txt captions, or a
.tar archive (webdataset-style {key}.jpg/{key}.txt pairs, read with the
stdlib tarfile — no webdataset dependency).
"""

from __future__ import annotations

import io
import os
import re
import tarfile

import numpy as np
from PIL import Image

HUMAN_ANIMAL_PAT = re.compile(
    r"\b(man|men|woman|women|person|people|human|boy|girl|child|children|kid|"
    r"baby|face|portrait|dog|cat|bird|horse|animal)\b")


class BackgroundOverlayProvider:
    """Iterates filtered (bg_image_512 uint8, caption) pairs."""

    def __init__(self, source: str, size: int = 512, seed: int | None = None,
                 special_strings=("z", "y")):
        self.source = source
        self.size = size
        self.special_pat = re.compile(
            r"\b(" + "|".join(re.escape(s) for s in special_strings) + r")\b")
        self.rng = np.random.default_rng(seed)
        self._items = None

    def _load_items(self):
        items = []
        if self.source.endswith(".tar"):
            with tarfile.open(self.source) as tf:
                members = {m.name: m for m in tf.getmembers() if m.isfile()}
                for name in sorted(members):
                    stem, ext = os.path.splitext(name)
                    if ext.lower() in (".jpg", ".jpeg", ".png", ".webp"):
                        cap = ""
                        if stem + ".txt" in members:
                            cap = tf.extractfile(members[stem + ".txt"]).read().decode().strip()
                        img = tf.extractfile(members[name]).read()
                        items.append((img, cap))
        else:
            for f in sorted(os.listdir(self.source)):
                stem, ext = os.path.splitext(f)
                if ext.lower() in (".jpg", ".jpeg", ".png", ".webp"):
                    cap_path = os.path.join(self.source, stem + ".txt")
                    cap = open(cap_path).read().strip() if os.path.exists(cap_path) else ""
                    items.append((os.path.join(self.source, f), cap))
        self._items = items

    def _accept(self, caption: str, w: int, h: int) -> bool:
        caption = caption.lower()
        if len(caption.strip()) < 5:
            return False
        if self.special_pat.search(caption) or HUMAN_ANIMAL_PAT.search(caption):
            return False
        ratio = w / h
        if not (0.75 <= ratio < 1.34):
            return False
        if max(self.size / h, self.size / w) >= 1.3:
            return False
        return True

    def sample(self, max_tries: int = 50):
        """-> (bg_image [size,size,3] uint8, caption) or None."""
        if self._items is None:
            self._load_items()
        if not self._items:
            return None
        for _ in range(max_tries):
            src, cap = self._items[int(self.rng.integers(len(self._items)))]
            img = Image.open(io.BytesIO(src) if isinstance(src, bytes) else src).convert("RGB")
            w, h = img.size
            if not self._accept(cap, w, h):
                continue
            # center-fit: scale the shorter edge to `size`, center crop
            scale = self.size / min(w, h)
            img = img.resize((int(round(w * scale)), int(round(h * scale))),
                             Image.BICUBIC)
            w2, h2 = img.size
            left, top = (w2 - self.size) // 2, (h2 - self.size) // 2
            img = img.crop((left, top, left + self.size, top + self.size))
            return np.asarray(img, np.uint8), cap
        return None


def composite_wds_example(example: dict, bg_image: np.ndarray, bg_caption: str,
                          cls_delta_string: str) -> dict:
    """Fill the wds_* example fields (personalized.py:771-830): paste the
    subject fg over the background and extend the prompts."""
    image_uint8 = example["image_unnorm"]
    fg_mask = example["fg_mask"]
    wds_image = np.where(fg_mask[:, :, None] > 0, image_uint8, bg_image)
    extra = ", in front of " + bg_caption.lower()
    cls_extra = " " + cls_delta_string + extra
    example = dict(example)
    example.update({
        "wds_comp_extra": extra,
        "wds_cls_comp_extra": cls_extra,
        "wds_caption": example["caption"] + extra,
        "wds_cls_caption": example["caption"] + cls_extra,
        "wds_caption_bg": example["caption_bg"] + extra,
        "wds_cls_caption_bg": example["caption_bg"] + cls_extra,
        "wds_image": (wds_image / 127.5 - 1.0).astype(np.float32),
        "wds_image_bgonly": (bg_image / 127.5 - 1.0).astype(np.float32),
        "wds_aug_mask": example["aug_mask"],
        "has_wds_comp": True,
    })
    return example
