"""Load PyTorch / safetensors checkpoints into numpy dicts and split SD
checkpoints into per-model state dicts.

Reference checkpoint layouts handled:
  * full SD-1.5 ckpt (stable_txt2img.py load_model_from_config /
    ldm/util.py:113-141): keys under 'model.diffusion_model.' (UNet),
    'first_stage_model.' (VAE), 'cond_stage_model.transformer.' (CLIP text);
  * diffusers-style directories are NOT required — the product path
    (adaface_wrapper.py) is re-implemented natively;
  * AdaFace embedding-manager ckpts (embedding_manager.py:1824-1838) are
    handled in adaprompt_tpu/adaface/checkpoint.py.
"""

from __future__ import annotations

import numpy as np


def load_state_dict(path: str) -> dict:
    """Load a .ckpt/.pt/.pth/.bin (torch), .safetensors, or flat .npz file
    to a numpy state dict."""
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        return {k: data[k] for k in data.files if k != "__meta__"}
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
        else:
            out[k] = v
    return out


def split_sd_checkpoint(sd: dict) -> dict:
    """Split a full SD checkpoint into {'unet', 'vae', 'text'} sub-dicts with
    their prefixes stripped to what the per-model porters expect."""
    unet, vae, text = {}, {}, {}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            unet[k.removeprefix("model.diffusion_model.")] = v
        elif k.startswith("first_stage_model."):
            vae[k.removeprefix("first_stage_model.")] = v
        elif k.startswith("cond_stage_model.transformer."):
            text[k.removeprefix("cond_stage_model.transformer.")] = v
    return {"unet": unet, "vae": vae, "text": text}
