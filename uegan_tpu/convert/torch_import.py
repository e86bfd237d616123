"""Torch ``.pth`` -> uegan_tpu parameter-tree converters.

The reference publishes a pretrained epoch-92 checkpoint
(``UEGAN-FiveK_rahinge_92.pth``; reference: README.md:71-74, tester.py:134)
as a dict {G_net, D_net, epoch, g_optimizer, d_optimizer, lr_scheduler_g,
lr_scheduler_d} (trainer.py:186-208).  These converters map torch state
dicts (NCHW / OIHW) onto the NHWC / HWIO flax trees, including spectral-norm
``weight_orig``/``weight_u``/``weight_v`` buffers, so converted weights give
PSNR/SSIM/NIMA parity on TPU.

Name maps (torch module paths come from the reference model structure):
- Generator: enc{i}.main.1 / upsample{i}.1.main.1 / dec{i}.main.1 /
  dec5.{0,1}.main.1 / ga{i}.{conv.0, conv.2, fuse.0}  (models.py:10-42)
- Discriminator: d{i}.0.1 / d{i}_pred.0.1              (models.py:104-137)
- VGG19: torchvision ``features.{idx}``                 (losses.py:39-114)
- NIMA: base_model.0.{idx} MobileNetV2 + head.2 linear  (CalcNIMA.py:23-42)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _load_torch(path: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _k(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_entry(sd: Dict, torch_prefix: str, use_sn: bool):
    """Return (params_dict, spectral_dict_or_None) for one conv."""
    if use_sn and f"{torch_prefix}.weight_orig" in sd:
        p = {"kernel": _k(_np(sd[f"{torch_prefix}.weight_orig"]))}
        s = {
            "u": _np(sd[f"{torch_prefix}.weight_u"]),
            "v": _np(sd[f"{torch_prefix}.weight_v"]),
        }
    else:
        p = {"kernel": _k(_np(sd[f"{torch_prefix}.weight"]))}
        s = None
    if f"{torch_prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{torch_prefix}.bias"])
    return p, s


def _norm_entry(sd: Dict, torch_prefix: str):
    """Affine norm with running stats -> (params, batch_stats) or (None, None)."""
    if f"{torch_prefix}.weight" not in sd:
        return None, None
    p = {"scale": _np(sd[f"{torch_prefix}.weight"]), "bias": _np(sd[f"{torch_prefix}.bias"])}
    bs = None
    if f"{torch_prefix}.running_mean" in sd:
        bs = {
            "mean": _np(sd[f"{torch_prefix}.running_mean"]),
            "var": _np(sd[f"{torch_prefix}.running_var"]),
        }
    return p, bs


class _TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.spectral: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}

    def _set(self, tree: Dict, path: Tuple[str, ...], value) -> None:
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def conv(self, sd, torch_prefix: str, path: Tuple[str, ...], use_sn: bool):
        p, s = _conv_entry(sd, torch_prefix, use_sn)
        self._set(self.params, path, p)
        if s is not None:
            self._set(self.spectral, path, s)

    def norm(self, sd, torch_prefix: str, path: Tuple[str, ...]):
        p, bs = _norm_entry(sd, torch_prefix)
        if p is not None:
            self._set(self.params, path, p)
        if bs is not None:
            self._set(self.batch_stats, path, bs)

    def variables(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {"params": self.params}
        if self.spectral:
            out["spectral"] = self.spectral
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def import_generator(sd: Dict, use_sn: bool = False) -> Dict[str, Any]:
    """G_net state dict -> flax variables for :class:`Generator`."""
    b = _TreeBuilder()
    for i in range(1, 6):
        b.conv(sd, f"enc{i}.main.1", (f"enc{i}", "conv"), use_sn)
        b.norm(sd, f"enc{i}.main.2", (f"enc{i}", "norm"))
    for i in range(1, 5):
        b.conv(sd, f"upsample{i}.1.main.1", (f"upsample{i}",), use_sn)
        b.conv(sd, f"dec{i}.main.1", (f"dec{i}", "conv"), use_sn)
        b.norm(sd, f"dec{i}.main.2", (f"dec{i}", "norm"))
    b.conv(sd, "dec5.0.main.1", ("dec5_0",), False)
    b.conv(sd, "dec5.1.main.1", ("dec5_1",), False)
    for i in range(1, 6):
        b.conv(sd, f"ga{i}.conv.0", (f"ga{i}", "squeeze"), False)
        b.conv(sd, f"ga{i}.conv.2", (f"ga{i}", "excite"), False)
        b.conv(sd, f"ga{i}.fuse.0", (f"ga{i}", "fuse"), use_sn)
    return b.variables()


def import_discriminator(sd: Dict, use_sn: bool = True) -> Dict[str, Any]:
    """D_net state dict -> flax variables for :class:`Discriminator`."""
    b = _TreeBuilder()
    for i in range(1, 6):
        b.conv(sd, f"d{i}.0.1", (f"d{i}", "conv"), use_sn)
        b.norm(sd, f"d{i}.0.2", (f"d{i}", "norm"))
        b.conv(sd, f"d{i}_pred.0.1", (f"d{i}_pred", "conv"), False)
    return b.variables()


def import_uegan_checkpoint(
    path: str, g_use_sn: bool = False, d_use_sn: bool = True
) -> Dict[str, Any]:
    """Full reference checkpoint -> {g_vars, d_vars, epoch}."""
    ckpt = _load_torch(path)
    out = {
        "g_vars": import_generator(ckpt["G_net"], g_use_sn),
        "d_vars": import_discriminator(ckpt["D_net"], d_use_sn),
        "epoch": float(ckpt.get("epoch", 0.0)),
    }
    return out


def import_vgg19(path: str) -> Dict[str, Any]:
    """torchvision vgg19 .pth -> flax variables for :class:`VGG19Features`."""
    from uegan_tpu.models.vgg import TORCH_FEATURE_INDEX

    sd = _load_torch(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: Dict[str, Any] = {}
    for name, idx in TORCH_FEATURE_INDEX.items():
        params[f"{name}_kernel"] = _k(_np(sd[f"features.{idx}.weight"]))
        params[f"{name}_bias"] = _np(sd[f"features.{idx}.bias"])
    return {"params": params}


def _bn_into(b: _TreeBuilder, sd, torch_prefix: str, path: Tuple[str, ...]):
    b._set(
        b.params,
        path + ("bn",),
        {"scale": _np(sd[f"{torch_prefix}.weight"]), "bias": _np(sd[f"{torch_prefix}.bias"])},
    )
    b._set(
        b.batch_stats,
        path + ("bn",),
        {
            "mean": _np(sd[f"{torch_prefix}.running_mean"]),
            "var": _np(sd[f"{torch_prefix}.running_var"]),
        },
    )


def import_nima(path: str) -> Dict[str, Any]:
    """NIMA pretrain-model.pth -> flax variables for :class:`NIMA`."""
    sd = _load_torch(path)
    if "state_dict" in sd if isinstance(sd, dict) else False:
        sd = sd["state_dict"]
    b = _TreeBuilder()
    base = "base_model.0"

    def convbn(torch_prefix: str, path: Tuple[str, ...]):
        b._set(b.params, path + ("kernel",), _k(_np(sd[f"{torch_prefix}.0.weight"])))
        _bn_into(b, sd, f"{torch_prefix}.1", path[:-1] + (path[-1],))

    # stem (features.0)
    b._set(b.params, ("base", "stem", "kernel"), _k(_np(sd[f"{base}.0.0.weight"])))
    _bn_into(b, sd, f"{base}.0.1", ("base", "stem"))
    # 17 inverted residual blocks (features.1..17)
    for i in range(17):
        t = f"{base}.{i + 1}.conv"
        p = ("base", f"block{i}")
        b._set(b.params, p + ("pw", "kernel"), _k(_np(sd[f"{t}.0.weight"])))
        _bn_into(b, sd, f"{t}.1", p + ("pw",))
        b._set(b.params, p + ("dw", "kernel"), _k(_np(sd[f"{t}.3.weight"])))
        _bn_into(b, sd, f"{t}.4", p + ("dw",))
        b._set(b.params, p + ("pw_linear", "kernel"), _k(_np(sd[f"{t}.6.weight"])))
        _bn_into(b, sd, f"{t}.7", p + ("pw_linear",))
    # head conv (features.18)
    b._set(b.params, ("base", "head_conv", "kernel"), _k(_np(sd[f"{base}.18.0.weight"])))
    _bn_into(b, sd, f"{base}.18.1", ("base", "head_conv"))
    # linear head (head.2)
    b._set(b.params, ("fc",), {
        "kernel": np.ascontiguousarray(_np(sd["head.2.weight"]).T),
        "bias": _np(sd["head.2.bias"]),
    })
    return b.variables()
