"""NIMA scoring — batched on-device and in the reference's disk/CSV protocol.

Disk protocol parity (reference: metrics/NIMA/CalcNIMA.py:58-105): every image
in a folder is resized (short side 256) + center-cropped to 224, scored, and
``NIMA_epoch_<epoch>__mean_std.csv`` records per-image mean/std with the
epoch average appended to ``NIMA_total_results_epoch_mean_std.csv``.  The
reference's divide-by-(N-1) average is behind ``legacy_average``.

The reference ran one image at a time through a CUDA model; here images are
batched and scored in a single jitted call per chunk.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from uegan_tpu.models.nima import NIMA, score_stats


def prepare_image_np(image: Image.Image) -> np.ndarray:
    """Resize(short side 256) -> CenterCrop(224) -> [0,1] float32 HWC.

    Matches torchvision Resize(256)+CenterCrop(224)+ToTensor with *no*
    normalization (reference: CalcNIMA.py:45-55).
    """
    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    if w <= h:
        nw, nh = 256, max(1, round(256 * h / w))
    else:
        nh, nw = 256, max(1, round(256 * w / h))
    image = image.resize((nw, nh), Image.BILINEAR)
    left = (nw - 224) // 2
    top = (nh - 224) // 2
    image = image.crop((left, top, left + 224, top + 224))
    return np.asarray(image, dtype=np.float32) / 255.0


def nima_scores(model: NIMA, variables, batch01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score a (N,224,224,3) [0,1] batch -> (means, stds)."""
    probs = model.apply(variables, batch01, train=False)
    return score_stats(probs)


def init_nima(weights_path: str = "", rng_seed: int = 0, compute_dtype: str = "float32"):
    """Build NIMA (+ converted torch weights when a .pth path is given).

    ``compute_dtype='bfloat16'`` runs the conv stack on the MXU at the bf16
    rate (params stay f32; BN statistics and the softmax head accumulate in
    f32).  PRICED r5 (benchmarks/nima_dtype.py, TPU, 64-image fixture,
    random init — the over-stating regime): per-image |d mean| avg 0.050 /
    max 0.178, set-average bias 0.034 on the 1-10 scale, against a 22.6x
    measured throughput gap (RESULTS_r4 config 2) — so the PRODUCT default
    is now bf16 (Config.nima_dtype); this function keeps f32 as its own
    default so direct library callers get reference-exact numerics unless
    they opt in.
    """
    model = NIMA(dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32)
    if weights_path and os.path.exists(weights_path):
        from uegan_tpu.convert.torch_import import import_nima

        variables = import_nima(weights_path)
    else:
        variables = model.init(jax.random.PRNGKey(rng_seed), jnp.zeros((1, 224, 224, 3)))
    return model, variables


def calc_nima(
    img_path: str,
    result_save_path: str,
    epoch,
    weights_path: str = "",
    batch_size: int = 16,
    legacy_average: bool = False,
    verbose: bool = True,
    compute_dtype: str = "float32",
) -> float:
    os.makedirs(result_save_path, exist_ok=True)
    epoch_csv = os.path.join(result_save_path, f"NIMA_epoch_{epoch}__mean_std.csv")
    total_csv = os.path.join(result_save_path, "NIMA_total_results_epoch_mean_std.csv")

    model, variables = init_nima(weights_path, compute_dtype=compute_dtype)
    score_fn = jax.jit(lambda b: nima_scores(model, variables, b))

    test_imgs = sorted(os.listdir(img_path))
    total_mean, total_std, n = 0.0, 0.0, 0
    with open(epoch_csv, "w") as ef:
        ef.write("image_name,mean,std\n")
        for i in range(0, len(test_imgs), batch_size):
            chunk = test_imgs[i : i + batch_size]
            arrs = [prepare_image_np(Image.open(os.path.join(img_path, f))) for f in chunk]
            batch = np.stack(arrs)
            if len(chunk) < batch_size:  # pad to the compiled batch shape
                pad = np.zeros((batch_size - len(chunk), 224, 224, 3), np.float32)
                batch = np.concatenate([batch, pad])
            means, stds = score_fn(jnp.asarray(batch))
            means, stds = np.asarray(means), np.asarray(stds)
            for j, fname in enumerate(chunk):
                ef.write(f"{fname},{round(float(means[j]), 6)},{round(float(stds[j]), 6)}\n")
                total_mean += float(means[j])
                total_std += float(stds[j])
                n += 1
            if verbose and (i // batch_size) % 4 == 0:
                print(f"=== NIMA is processing {i:>3d}-th image ===")
        denom = max(n - 1, 1) if legacy_average else max(n, 1)
        avg_mean = total_mean / denom
        avg_std = total_std / denom
        ef.write(f"Average,{round(avg_mean, 6)},{round(avg_std, 6)}\n")
    with open(total_csv, "a+") as tf:
        tf.write(f"{epoch},{round(avg_mean, 6)},{round(avg_std, 6)}\n")
    if verbose:
        print(f"======= Complete the NIMA test of {n:>3d} images =======")
    return avg_mean
