"""BiSeNet face parser (19-class) — training-data mask generation.

The reference prepares its training masks with zllrunning's
face-parsing.PyTorch BiSeNet (/root/reference/scripts-private/
gen_face_masks.py:1-185: 512x512 input, ImageNet normalization, argmax over
19 classes, mask = parsing != 0). This is the TPU-native equivalent:
ResNet-18 context path + attention refinement + feature fusion, NHWC bf16,
weights portable from the public `79999_iter.pth` checkpoint layout
(cp.resnet.*, cp.arm16/32.*, cp.conv_avg/head16/head32.*, ffm.*,
conv_out*.*).

Upsampling conventions: nearest inside the context path, bilinear
(align_corners=True, matching F.interpolate in the public model) for the
final logits.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adaprompt_tpu.ops.layers import conv2d


@dataclasses.dataclass(frozen=True)
class BiSeNetConfig:
    n_classes: int = 19
    input_size: int = 512


BISENET_FACE = BiSeNetConfig()

_RESNET18_LAYERS = ((64, 64, 2), (64, 128, 2), (128, 256, 2), (256, 512, 2))


# ---------------------------------------------------------------------------
# init / torch port
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype):
    std = np.sqrt(2.0 / (kh * kw * cout))
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std}


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _cbr_init(key, cin, cout, ks, dtype):
    return {"conv": _conv_init(key, ks, ks, cin, cout, dtype),
            "bn": _bn_init(cout, dtype)}


def _arm_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    return {"conv": _cbr_init(k1, cin, cout, 3, dtype),
            "conv_atten": _conv_init(k2, 1, 1, cout, cout, dtype),
            "bn_atten": _bn_init(cout, dtype)}


def init_params(key: jax.Array, cfg: BiSeNetConfig = BISENET_FACE,
                dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))
    nk = lambda: next(ks)

    def block(cin, cout, stride):
        p = {"conv1": _conv_init(nk(), 3, 3, cin, cout, dtype),
             "bn1": _bn_init(cout, dtype),
             "conv2": _conv_init(nk(), 3, 3, cout, cout, dtype),
             "bn2": _bn_init(cout, dtype)}
        if stride != 1 or cin != cout:
            p["down_conv"] = _conv_init(nk(), 1, 1, cin, cout, dtype)
            p["down_bn"] = _bn_init(cout, dtype)
        return p

    resnet = {"conv1": _conv_init(nk(), 7, 7, 3, 64, dtype),
              "bn1": _bn_init(64, dtype), "layers": []}
    for cin, cout, n in _RESNET18_LAYERS:
        stage = [block(cin, cout, 1 if cin == cout else 2)]
        # first stage keeps stride 1 (after the stem's maxpool)
        if cin == 64 and cout == 64:
            stage = [block(64, 64, 1)]
        stage += [block(cout, cout, 1) for _ in range(n - 1)]
        resnet["layers"].append(stage)

    def out_head(cin, mid):
        return {"conv": _cbr_init(nk(), cin, mid, 3, dtype),
                "conv_out": {**_conv_init(nk(), 1, 1, mid, cfg.n_classes, dtype),
                             "bias": jnp.zeros((cfg.n_classes,), dtype)}}

    return {
        "resnet": resnet,
        "arm16": _arm_init(nk(), 256, 128, dtype),
        "arm32": _arm_init(nk(), 512, 128, dtype),
        "conv_avg": _cbr_init(nk(), 512, 128, 1, dtype),
        "conv_head32": _cbr_init(nk(), 128, 128, 3, dtype),
        "conv_head16": _cbr_init(nk(), 128, 128, 3, dtype),
        "ffm": {"convblk": _cbr_init(nk(), 256, 256, 1, dtype),
                "conv1": {**_conv_init(nk(), 1, 1, 256, 64, dtype),
                          "bias": jnp.zeros((64,), dtype)},
                "conv2": {**_conv_init(nk(), 1, 1, 64, 256, dtype),
                          "bias": jnp.zeros((256,), dtype)}},
        "conv_out": out_head(256, 256),
    }


def from_torch(state_dict, cfg: BiSeNetConfig = BISENET_FACE,
               dtype=jnp.float32) -> dict:
    """Port the public face-parsing.PyTorch `79999_iter.pth` layout."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    def conv(p, bias=False):
        out = {"kernel": jnp.asarray(sd[p + ".weight"].transpose(2, 3, 1, 0), dtype)}
        if bias and p + ".bias" in sd:
            out["bias"] = jnp.asarray(sd[p + ".bias"], dtype)
        return out

    def bn(p):
        return {"scale": jnp.asarray(sd[p + ".weight"], dtype),
                "bias": jnp.asarray(sd[p + ".bias"], dtype),
                "mean": jnp.asarray(sd[p + ".running_mean"], dtype),
                "var": jnp.asarray(sd[p + ".running_var"], dtype)}

    def cbr(p):
        return {"conv": conv(p + ".conv"), "bn": bn(p + ".bn")}

    def arm(p):
        return {"conv": cbr(p + ".conv"), "conv_atten": conv(p + ".conv_atten"),
                "bn_atten": bn(p + ".bn_atten")}

    def res_block(p):
        out = {"conv1": conv(p + ".conv1"), "bn1": bn(p + ".bn1"),
               "conv2": conv(p + ".conv2"), "bn2": bn(p + ".bn2")}
        if p + ".downsample.0.weight" in sd:
            out["down_conv"] = conv(p + ".downsample.0")
            out["down_bn"] = bn(p + ".downsample.1")
        return out

    r = "cp.resnet"
    resnet = {"conv1": conv(r + ".conv1"), "bn1": bn(r + ".bn1"), "layers": []}
    for si, (_, _, n) in enumerate(_RESNET18_LAYERS, start=1):
        resnet["layers"].append(
            [res_block(f"{r}.layer{si}.{bi}") for bi in range(n)])

    def out_head(p):
        return {"conv": cbr(p + ".conv"), "conv_out": conv(p + ".conv_out", bias=True)}

    return {
        "resnet": resnet,
        "arm16": arm("cp.arm16"), "arm32": arm("cp.arm32"),
        "conv_avg": cbr("cp.conv_avg"),
        "conv_head32": cbr("cp.conv_head32"),
        "conv_head16": cbr("cp.conv_head16"),
        "ffm": {"convblk": cbr("ffm.convblk"),
                "conv1": conv("ffm.conv1", bias=True),
                "conv2": conv("ffm.conv2", bias=True)},
        "conv_out": out_head("conv_out"),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _cbr(p, x, stride=1):
    k = p["conv"]["kernel"]
    pad = k.shape[0] // 2
    x = conv2d(x, k, None, stride=stride, padding=pad)
    return jax.nn.relu(_bn_apply(p["bn"], x))


def _res_block(p, x):
    # stride 2 exactly when the block changes resolution (the first block
    # of layers 2-4); detected via the channel change
    cin = x.shape[-1]
    cout = p["conv1"]["kernel"].shape[-1]
    stride = 2 if ("down_conv" in p and cin != cout) else 1
    h = conv2d(x, p["conv1"]["kernel"], None, stride=stride, padding=1)
    h = jax.nn.relu(_bn_apply(p["bn1"], h))
    h = conv2d(h, p["conv2"]["kernel"], None, padding=1)
    h = _bn_apply(p["bn2"], h)
    if "down_conv" in p:
        x = conv2d(x, p["down_conv"]["kernel"], None, stride=stride, padding=0)
        x = _bn_apply(p["down_bn"], x)
    return jax.nn.relu(x + h)


def _resnet18_feats(p, x):
    x = conv2d(x, p["conv1"]["kernel"], None, stride=2, padding=3)
    x = jax.nn.relu(_bn_apply(p["bn1"], x))
    # maxpool 3x3 stride 2, SAME-ish padding 1
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    feats = []
    for stage in p["layers"]:
        for bp in stage:
            x = _res_block(bp, x)
        feats.append(x)
    return feats[1], feats[2], feats[3]   # H/8, H/16, H/32


def _upsample_nearest(x, factor):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def _arm(p, x):
    feat = _cbr(p["conv"], x)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = conv2d(atten, p["conv_atten"]["kernel"], None, padding=0)
    atten = jax.nn.sigmoid(_bn_apply(p["bn_atten"], atten))
    return feat * atten


def _bilinear_align_corners(x, out_hw):
    """F.interpolate(mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def weights(n_in, n_out):
        if n_out == 1:
            src = np.zeros((1,))
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = weights(h, oh)
    xlo, xhi, xf = weights(w, ow)
    yf = jnp.asarray(yf)[None, :, None, None]
    xf = jnp.asarray(xf)[None, None, :, None]
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf) + bot * yf


def forward(params: dict, x: jax.Array,
            cfg: BiSeNetConfig = BISENET_FACE) -> jax.Array:
    """x: [B, H, W, 3] ImageNet-normalized. Returns logits [B, H, W, 19]."""
    h_in, w_in = x.shape[1:3]
    feat8, feat16, feat32 = _resnet18_feats(params["resnet"], x)

    avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
    avg = _cbr(params["conv_avg"], avg)

    f32 = _arm(params["arm32"], feat32) + avg          # broadcast add
    f32 = _upsample_nearest(f32, 2)
    f32 = _cbr(params["conv_head32"], f32)             # H/16

    f16 = _arm(params["arm16"], feat16) + f32
    f16 = _upsample_nearest(f16, 2)
    f16 = _cbr(params["conv_head16"], f16)             # H/8 (context)

    # feature fusion of the spatial path (= feat8) and the context path
    fuse_in = jnp.concatenate([feat8, f16], axis=-1)
    feat = _cbr(params["ffm"]["convblk"], fuse_in)
    atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
    atten = conv2d(atten, params["ffm"]["conv1"]["kernel"],
                   params["ffm"]["conv1"].get("bias"), padding=0)
    atten = jax.nn.relu(atten)
    atten = conv2d(atten, params["ffm"]["conv2"]["kernel"],
                   params["ffm"]["conv2"].get("bias"), padding=0)
    atten = jax.nn.sigmoid(atten)
    feat = feat * atten + feat

    out = _cbr(params["conv_out"]["conv"], feat)
    out = conv2d(out, params["conv_out"]["conv_out"]["kernel"],
                 params["conv_out"]["conv_out"].get("bias"), padding=0)
    return _bilinear_align_corners(out, (h_in, w_in))


def preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 [B, 512, 512, 3] -> ImageNet-normalized float32 (the
    transforms in gen_face_masks.py:84-87)."""
    x = np.asarray(images_uint8, np.float32) / 255.0
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def parse_faces(params: dict, images_uint8,
                cfg: BiSeNetConfig = BISENET_FACE) -> np.ndarray:
    """Images -> per-pixel part labels [B, H, W] (argmax over classes)."""
    x = jnp.asarray(preprocess(np.stack([np.asarray(i) for i in images_uint8])))
    logits = forward(params, x, cfg)
    return np.asarray(jnp.argmax(logits, axis=-1))
