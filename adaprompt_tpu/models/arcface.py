"""ArcFace face-recognition trunk (IResNet) in JAX — on-device ID embeddings.

The reference runs insightface's `antelopev2` ArcFace ONNX model on CPU/GPU
outside autograd (SURVEY.md §2.6; ddpm.py:2344-2358, adaface/util.py:242-341).
For the TPU build, face *recognition* runs on-device: this is the standard
IResNet{18,50,100} architecture (glintr100 == IResNet-100, 512-d output,
112x112 input, (x-127.5)/127.5 preprocessing). Weights port from the
public torch `iresnet` layout (insightface/recognition/arcface_torch) or an
equivalently-named npz; detection (RetinaFace) stays host-side (per-subject
preprocessing, not a hot path).

All BatchNorms run in inference mode (running stats folded at port time is
left to XLA constant folding).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class IResNetConfig:
    layers: tuple = (3, 13, 30, 3)   # IResNet-100
    planes: tuple = (64, 128, 256, 512)
    num_features: int = 512
    input_size: int = 112
    bn_eps: float = 1e-5


IRESNET100 = IResNetConfig()
IRESNET50 = IResNetConfig(layers=(3, 4, 14, 3))
IRESNET18 = IResNetConfig(layers=(2, 2, 2, 2))


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan = kh * kw * cin
    return {"kernel": (jax.random.normal(key, (kh, kw, cin, cout)) / np.sqrt(fan)).astype(dtype)}


def init_params(key: jax.Array, cfg: IResNetConfig = IRESNET100, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 4 + 2 * sum(cfg.layers) * 2 + 8))
    nk = lambda: next(ks)

    def block(cin, cout, stride):
        p = {"bn1": _bn_init(cin, dtype),
             "conv1": _conv_init(nk(), 3, 3, cin, cout, dtype),
             "bn2": _bn_init(cout, dtype),
             "prelu": {"alpha": jnp.full((cout,), 0.25, dtype)},
             "conv2": _conv_init(nk(), 3, 3, cout, cout, dtype),
             "bn3": _bn_init(cout, dtype)}
        if stride != 1 or cin != cout:
            p["down_conv"] = _conv_init(nk(), 1, 1, cin, cout, dtype)
            p["down_bn"] = _bn_init(cout, dtype)
        return p

    stages = []
    cin = 64
    for n, cout in zip(cfg.layers, cfg.planes):
        blocks = [block(cin, cout, 2)]
        cin = cout
        blocks += [block(cin, cout, 1) for _ in range(n - 1)]
        stages.append(blocks)

    spatial = cfg.input_size // 16
    return {
        "conv1": _conv_init(nk(), 3, 3, 3, 64, dtype),
        "bn1": _bn_init(64, dtype),
        "prelu": {"alpha": jnp.full((64,), 0.25, dtype)},
        "stages": stages,
        "bn2": _bn_init(cfg.planes[-1], dtype),
        "fc": {"kernel": (jax.random.normal(nk(), (cfg.planes[-1] * spatial * spatial,
                                                   cfg.num_features)) * 0.01).astype(dtype),
               "bias": jnp.zeros((cfg.num_features,), dtype)},
        "features_bn": _bn_init(cfg.num_features, dtype),
    }


def from_torch(state_dict, cfg: IResNetConfig = IRESNET100, dtype=jnp.float32) -> dict:
    """Port the public arcface_torch iresnet state_dict."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        sd[k] = np.asarray(v)

    def conv(p):
        return {"kernel": jnp.asarray(sd[p + ".weight"].transpose(2, 3, 1, 0), dtype)}

    def bn(p):
        return {"scale": jnp.asarray(sd[p + ".weight"], dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype),
                "mean": jnp.asarray(sd[p + ".running_mean"], dtype),
                "var": jnp.asarray(sd[p + ".running_var"], dtype)}

    def prelu(p):
        return {"alpha": jnp.asarray(sd[p + ".weight"], dtype)}

    stages = []
    for si, n in enumerate(cfg.layers, start=1):
        blocks = []
        for bi in range(n):
            p = f"layer{si}.{bi}"
            bp = {"bn1": bn(p + ".bn1"), "conv1": conv(p + ".conv1"),
                  "bn2": bn(p + ".bn2"), "prelu": prelu(p + ".prelu"),
                  "conv2": conv(p + ".conv2"), "bn3": bn(p + ".bn3")}
            if p + ".downsample.0.weight" in sd:
                bp["down_conv"] = conv(p + ".downsample.0")
                bp["down_bn"] = bn(p + ".downsample.1")
            blocks.append(bp)
        stages.append(blocks)

    # torch fc: [512, 512*7*7] over NCHW-flattened features; our forward
    # flattens NHWC — permute the input dim accordingly.
    spatial = cfg.input_size // 16
    c = cfg.planes[-1]
    w = sd["fc.weight"]  # [F, C*H*W] (CHW order)
    w = w.reshape(cfg.num_features, c, spatial, spatial).transpose(2, 3, 1, 0)  # HWC,F
    w = w.reshape(spatial * spatial * c, cfg.num_features)

    return {
        "conv1": conv("conv1"), "bn1": bn("bn1"), "prelu": prelu("prelu"),
        "stages": stages, "bn2": bn("bn2"),
        "fc": {"kernel": jnp.asarray(w, dtype), "bias": jnp.asarray(sd["fc.bias"], dtype)},
        "features_bn": bn("features"),
    }


def from_onnx(path: str, cfg: IResNetConfig = IRESNET100,
              dtype=jnp.float32) -> dict:
    """Port ArcFace weights straight from an insightface .onnx file
    (antelopev2 glintr100 — the reference's recognition model,
    adaface/util.py:242-341). Works when the export kept the arcface_torch
    module names in the initializers (the standard torch.onnx export of
    iresnet); raises with the found names otherwise so a rename map can be
    supplied."""
    from adaprompt_tpu.utils.onnx_port import read_onnx_initializers
    init = read_onnx_initializers(path)
    if "conv1.weight" not in init:
        sample = sorted(init)[:20]
        raise ValueError(
            "ONNX initializers don't carry arcface_torch module names; "
            f"found e.g. {sample}. Convert with a rename map to the "
            "layerN.M.* layout and call from_torch().")
    return from_torch(init, cfg, dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bn(p, x, eps):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def _prelu(p, x):
    a = p["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _conv(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1x1(p, x, stride):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _block(p, x, stride, eps):
    h = _bn(p["bn1"], x, eps)
    h = _conv(p["conv1"], h)
    h = _bn(p["bn2"], h, eps)
    h = _prelu(p["prelu"], h)
    h = _conv(p["conv2"], h, stride=stride)
    h = _bn(p["bn3"], h, eps)
    if "down_conv" in p:
        x = _bn(p["down_bn"], _conv1x1(p["down_conv"], x, stride), eps)
    return x + h


def forward(params: dict, x: jax.Array, cfg: IResNetConfig = IRESNET100) -> jax.Array:
    """images [B, 112, 112, 3], values in [-1, 1] ((pix-127.5)/127.5, RGB)
    -> embeddings [B, 512] (not normalized; callers L2-normalize)."""
    eps = cfg.bn_eps
    h = _conv(params["conv1"], x)
    h = _bn(params["bn1"], h, eps)
    h = _prelu(params["prelu"], h)
    for blocks in params["stages"]:
        for i, bp in enumerate(blocks):
            h = _block(bp, h, 2 if i == 0 else 1, eps)
    h = _bn(params["bn2"], h, eps)
    h = h.reshape(h.shape[0], -1)
    h = jnp.dot(h, params["fc"]["kernel"].astype(h.dtype)) + params["fc"]["bias"].astype(h.dtype)
    return _bn(params["features_bn"], h, eps)


def preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 RGB [B, 112, 112, 3] -> model input."""
    return (np.asarray(images_uint8, np.float32) - 127.5) / 127.5


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)
