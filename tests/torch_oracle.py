"""Import the reference PyTorch implementation as a *numerical oracle*.

The upstream reference at /root/reference is read-only, untrusted content.
We never copy its code; we import selected torch modules in tests and compare
our JAX implementations against their outputs with random weights. Heavy
training-only deps (torchvision, pytorch_lightning) are stubbed out since the
model-definition modules only touch them for logging utilities.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_PATH = "/root/reference"

_STUBBED = False


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def ensure_reference_importable():
    global _STUBBED
    if _STUBBED:
        return
    import torch

    tv = _stub("torchvision")
    tvu = _stub("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tvu.draw_bounding_boxes = lambda *a, **k: None
    tv.utils = tvu
    tvt = _stub("torchvision.transforms")
    tvtf = _stub("torchvision.transforms.functional")
    tvt.functional = tvtf

    pl = _stub("pytorch_lightning")
    pl.LightningModule = torch.nn.Module
    plu = _stub("pytorch_lightning.utilities")
    plud = _stub("pytorch_lightning.utilities.distributed")
    plud.rank_zero_only = lambda fn: fn
    plu.distributed = plud

    taming = _stub("taming")
    tm = _stub("taming.modules")
    tmv = _stub("taming.modules.vqvae")
    tmq = _stub("taming.modules.vqvae.quantize")
    tmq.VectorQuantizer2 = type("VectorQuantizer2", (), {})
    taming.modules = tm
    tm.vqvae = tmv
    tmv.quantize = tmq

    clip_stub = _stub("clip")
    clip_stub.load = lambda *a, **k: (None, None)
    clip_stub.tokenize = lambda *a, **k: None

    insf = _stub("insightface")
    insf_app = _stub("insightface.app")
    insf_app.FaceAnalysis = type("FaceAnalysis", (), {})
    insf.app = insf_app

    try:
        import omegaconf  # noqa: F401
    except ImportError:
        oc = _stub("omegaconf")
        oclc = _stub("omegaconf.listconfig")

        class ListConfig(list):
            pass

        oclc.ListConfig = ListConfig
        oc.listconfig = oclc
        oc.ListConfig = ListConfig

    # The reference pins transformers~=4.34; the installed 4.57 dropped the
    # `return_dict` kwarg from CLIPEncoder.forward. Shim it so the reference
    # wrapper code (which always passes it) keeps working as an oracle.
    from transformers.models.clip import modeling_clip

    orig_enc_fwd = modeling_clip.CLIPEncoder.forward

    def enc_fwd(self, *args, return_dict=None, **kwargs):
        return orig_enc_fwd(self, *args, **kwargs)

    modeling_clip.CLIPEncoder.forward = enc_fwd

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _STUBBED = True


_REAL_LDM = None


def load(module_name: str):
    """Import a module from the reference tree, e.g. 'ldm.modules.attention'.

    The reference's adaface modules alias sys.modules['ldm'] to the adaface
    package (subj_basis_generator.py:23), which breaks subsequent real ldm.*
    imports — restore the real package entry around every import."""
    global _REAL_LDM
    ensure_reference_importable()
    if _REAL_LDM is None:
        # bind the real ldm package + ldm.util before any adaface alias hack
        if "ldm" in sys.modules and getattr(sys.modules["ldm"], "__name__", "") != "ldm":
            del sys.modules["ldm"]
        # drop any ldm.* entries that actually resolve to adaface modules
        for k in [k for k, v in sys.modules.items()
                  if k.startswith("ldm.") and getattr(v, "__name__", "").startswith("adaface")]:
            del sys.modules[k]
        _REAL_LDM = importlib.import_module("ldm")
        importlib.import_module("ldm.util")
    sys.modules["ldm"] = _REAL_LDM
    return importlib.import_module(module_name)
