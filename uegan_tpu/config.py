"""Typed configuration for uegan_tpu.

Mirrors every flag of the reference CLI (reference: config.py:7-83) with the
same names and defaults, plus TPU-specific knobs (mesh shape, dtype policy,
spatial sharding, on-device metrics).  The reference used a flat argparse
namespace; here the canonical object is a frozen dataclass so a config can be
hashed into jit static args and serialized next to checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# Enumerations (reference: config.py:12,21,25-28,42,49)
ADV_LOSS_TYPES = ("ls", "original", "w", "hinge", "rahinge", "rals")
ACT_FUNS = ("LeakyReLU", "ReLU", "Swish", "SELU", "none")
NORM_FUNS = ("BatchNorm", "InstanceNorm", "none")
INIT_TYPES = (
    "normal",
    "xavier",
    "xavier_uniform",
    "kaiming",
    "kaiming_uniform",
    "orthogonal",
    "none",
)
IDT_LOSS_TYPES = ("l1", "l2", "smoothl1")
OPTIMIZER_TYPES = ("adam", "rmsprop")


def str2bool(v) -> bool:
    """Truthiness used by the reference CLI (reference: utils.py:133-134)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes")


@dataclass(frozen=True)
class Config:
    # ---- model configuration (reference: config.py:11-28) ----
    mode: str = "train"  # train | test
    adv_loss_type: str = "rahinge"
    image_size: int = 512  # random-crop size before resize (train)
    resize_size: int = 256  # resolution after resizing (train)
    test_img_size: int = 512  # test/val resize resolution
    g_conv_dim: int = 32
    d_conv_dim: int = 32
    shuffle: bool = True
    drop_last: bool = True
    version: str = "UEGAN-FiveK"
    init_type: str = "orthogonal"
    adv_input: bool = True  # D also sees the raw input as a fake distribution
    g_use_sn: bool = False
    d_use_sn: bool = True
    g_act_fun: str = "LeakyReLU"
    d_act_fun: str = "LeakyReLU"
    g_norm_fun: str = "none"
    d_norm_fun: str = "none"

    # ---- training configuration (reference: config.py:31-50) ----
    pretrained_model: float = 0.0  # epoch to resume from / test with
    total_epochs: int = 100
    train_batch_size: int = 10
    val_batch_size: int = 1
    num_workers: int = 8  # host pipeline prefetch threads
    seed: int = 1990
    g_lr: float = 1e-4
    d_lr: float = 4e-4
    lr_decay: bool = True
    lr_num_epochs_decay: int = 50
    lr_decay_ratio: int = 50
    optimizer_type: str = "adam"
    beta1: float = 0.5
    beta2: float = 0.999
    alpha: float = 0.9  # rmsprop decay
    weight_decay: float = 1e-4  # torch-Adam style L2 (reference: trainer.py:337)
    lambda_adv: float = 0.10
    lambda_percep: float = 1.0
    lambda_idt: float = 0.10
    idt_loss_type: str = "l1"
    pool_size: int = 50

    # ---- validation / test configuration (reference: config.py:53-54) ----
    num_epochs_start_val: int = 8
    val_each_epochs: int = 2

    # ---- directories (reference: config.py:57-67) ----
    train_img_dir: str = "./data/fivek/train"
    val_img_dir: str = "./data/fivek/val"
    test_img_dir: str = "./data/fivek/test"
    save_root_dir: str = "./results"
    val_label_dir: str = "./data/fivek/val/label/"
    test_label_dir: str = "./data/fivek/test/label/"
    model_save_path: str = "models"
    sample_path: str = "samples"
    log_path: str = "logs"
    val_result_path: str = "validation"
    test_result_path: str = "test"

    # ---- step sizes (reference: config.py:70-73) ----
    log_step: int = 100
    info_step: int = 100
    sample_step: int = 100
    model_save_epoch: int = 1

    # ---- misc (reference: config.py:76-81) ----
    parallel: bool = False  # kept for CLI parity; superseded by mesh flags
    gpu_ids: Tuple[int, ...] = (0, 1, 2, 3)  # kept for CLI parity; unused
    use_tensorboard: bool = False
    is_print_network: bool = True
    is_test_nima: bool = True
    is_test_psnr_ssim: bool = False

    # ---- TPU-native additions (no reference analog) ----
    mesh_data: int = 0  # 0 = all local devices on the data axis
    mesh_spatial: int = 1  # spatial (H) sharding factor for high-res inference
    compute_dtype: str = "bfloat16"  # conv compute dtype; params stay fp32
    param_dtype: str = "float32"
    on_device_metrics: bool = True  # batched PSNR/SSIM/NIMA on device
    legacy_metrics: bool = False  # replicate the reference's divide-by-(N-1)
    vgg_weights: str = ""  # optional torchvision vgg19 .pth for conversion
    nima_weights: str = ""  # optional NIMA .pth for conversion
    nima_dtype: str = "bfloat16"  # NIMA eval conv dtype.  PRICED r5
    # (benchmarks/nima_dtype.py on TPU, 64-image fixture, random init — the
    # regime that OVER-states the error): per-image |d mean| avg 0.050 / max
    # 0.178, set-average bias 0.034 on the 1-10 scale, vs a 22.6x measured
    # throughput gap (RESULTS_r4 config 2: 1,329 f32 vs 29,979 bf16 img/s).
    # Negligible for best-epoch selection (systematic bias, and trained
    # weights' confident logits shrink it further); set float32 to restore
    # reference-exact metric numerics.
    tile_size: int = 0  # >0: overlap-tile inference tile edge (single device)
    tile_overlap: int = 32
    remat: bool = False  # rematerialize conv blocks (512px training memory)
    cache_data: bool = False  # RAM-cache decoded images (small datasets)
    device_image_io: bool = True  # ship uint8 pixels across PCIe/host links
    # and do the [-1,1] normalize / uint8 quantize ON DEVICE (bit-identical
    # f32 op sequences — see data/pipeline.py:device_normalize and
    # train/tester.py:_quantize_u8).  4x less host->device and 2-4x less
    # device->host traffic than float batches; False restores float I/O.
    packed_inference: bool = True  # space-to-depth packed G inference
    # (1.57x measured; bit-equivalent to 1e-5; default-G-config only —
    # silently falls back to the canonical forward otherwise)
    fused_d: bool = True  # batch all D inputs of a phase into one forward
    # (3 fwd -> 1 in the D update, 2 -> 1 in the G update; +8.6% steps/s).
    # With spectral norm (the default D) each branch's conv output is scaled
    # by its own per-power-iteration sigma (conv(x, W/s) == conv(x, W)/s), so
    # the torch sequential-forward SN semantics are preserved EXACTLY —
    # test-enforced against the sequential path.  Identical math when
    # d_use_sn=False (bit-level, test-enforced).  Batch/Instance-norm Ds keep
    # sequential forwards regardless (running stats would deviate).
    split_percep_label: bool = True  # run the perceptual loss's label
    # branch (real_raw) as its own stop-gradiented VGG call instead of one
    # batched call over concat([fake, raw]).  Per-sample math identical;
    # the split halves the VGG backward input-grad work (the label half of
    # the batched backward carries no gradients).  Measured (ab_train, r3):
    # 256px b10 11.14 -> 11.68 steps/s; 512px b2 remat 8.18 -> 8.32.
    split_g_adv: bool = True  # in the G update, run D(exp) and D(fake) as
    # two sequential forwards instead of one fused 2x-batch forward: the
    # exp half of the fused backward is dead work (no gradient path from
    # img_exp to G), so the split halves the D backward in the G phase.
    # Sequential == fused SN semantics (see fused_d); value-level equality
    # to float tolerance (conv(x, W/s) vs conv(x, W)/s).  Measured (r3):
    # neutral at 256px b10 (11.11 vs 11.14 — D bwd is small there), +1%
    # at 512px b2 remat; with split_percep_label 8.18 -> 8.48 steps/s.
    packed_train: bool = True  # run the G forward in the train step packed
    # (kernels packed from the live params at trace time, differentiable;
    # +30% steps/s measured.  Same math as canonical to float tolerance but
    # NOT bit-identical — the loss-canary change was deliberate; set False
    # for the bit-canonical step.  Default-G-config only, else falls back.)
    packed_train_l2: bool = False  # additionally run the half-res interior
    # stage group (enc3/ga2/up3/dec3) of the packed train forward in a
    # SECOND space-to-depth level (C=64 -> 256 lanes).  Measured via
    # benchmarks/ab_train.py (wire-or-retire bar; see OPTIMIZATION_NOTES
    # round-4 for the verdict + numbers); equality test-enforced.
    # Requires packed_train.
    strip_rows: int = 0  # exact H-strip execution for huge images:
    # 0 = auto (256-packed-row strips once the packed height reaches 1024,
    # i.e. images >= 2048px), -1 = off, >0 = forced packed rows per strip.
    # XLA space-blocks >=1024-row conv maps and the layout copies dominate
    # (80% of device time at 2048px); strip slabs with reflect-extended
    # halos keep every conv under the blocking threshold while staying
    # EXACT (margins cover the chain's receptive reach; equality with the
    # direct packed forward is test-enforced).  See infer/strips.py.
    strip_chunks: int = 0  # strips per exit-chain chunk in the strip
    # executor: 0 = auto (chunk only when the unchunked exit chain would
    # blow HBM — e.g. 8192px single-chip, which OOMed at compile unchunked;
    # 4096px fits and stays unchunked), -1 = never chunk, >0 = forced
    # strips per chunk.  Chunked execution runs dec3..output (including the
    # space-to-depth unpack) under lax.map so only one chunk's slab
    # temporaries are live; numerics are identical (chunked == unchunked is
    # test-enforced).  See infer/strips.py:make_strip_eval.
    quantized_inference: str = ""  # "" (off), "int8", or "int8_pallas":
    # quantize the packed full-res convs to int8 (2x MXU rate, half HBM).
    # OPT-IN and lossy (>=30 dB vs bf16, test-enforced); requires
    # packed_inference and the default G config, else falls back.
    # "int8_pallas" routes eligible convs through the Pallas fused-epilogue
    # kernel — EXPERIMENTAL and measured SLOWER end-to-end on the current
    # stack (406-473 vs 523 img/s: Mosaic's s8 matmul runs at the bf16 MXU
    # rate and pallas boundaries force big layout copies, while XLA's int8
    # convs hit the native 2x rate and fuse tighter).  Kept for
    # re-measurement on future stacks.  Use "int8" for production.
    # See infer/quantized.py, ops/pallas/packed_conv_int8.py.
    test_keep_aspect: bool = False  # keep native resolution (pad to /16)
    profile_dir: str = ""  # jax.profiler trace output
    checkpoint_async: bool = True
    g_ema_decay: float = 0.0  # > 0: keep a Polyak/EMA copy of the G params
    # (updated inside the jitted step; Karras-style warmup
    # min(decay, (1+t)/(10+t)) so early steps track the live params).  The
    # r5 convergence runs show classic adversarial drift after the PSNR
    # peak (25.2 dB at step 750 -> 21.6 at 3000, CONVERGENCE_r5.json); an
    # EMA generator averages through the D-chasing oscillation.  The
    # reference has no analog (its answer is best-epoch checkpoint
    # selection, which stays available); 0.0 (off) preserves the
    # bit-canonical step.  Try 0.999 for fixture-scale runs, 0.9999 at
    # FiveK scale.
    ema_eval: bool = True  # when an EMA copy exists, validate/test with it
    # (Trainer validation + Tester inference); False evaluates the live
    # params even if the checkpoint carries an EMA copy.

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "Config":
        if self.adv_loss_type not in ADV_LOSS_TYPES:
            raise ValueError(f"adv_loss_type [{self.adv_loss_type}] is not found")
        for a in (self.g_act_fun, self.d_act_fun):
            if a not in ACT_FUNS:
                raise ValueError(f"activation function [{a}] is not found")
        for n in (self.g_norm_fun, self.d_norm_fun):
            if n not in NORM_FUNS:
                raise ValueError(f"normalization function [{n}] is not found")
        if self.init_type and self.init_type not in INIT_TYPES:
            raise ValueError(f"initialization method [{self.init_type}] is not implemented")
        if self.idt_loss_type not in IDT_LOSS_TYPES:
            raise ValueError(f"identity loss type [{self.idt_loss_type}] is not implemented")
        if self.optimizer_type not in OPTIMIZER_TYPES:
            raise ValueError(f"optimizer [{self.optimizer_type}] is not found")
        if self.quantized_inference not in ("", "int8", "int8_pallas"):
            raise ValueError(
                f"quantized_inference [{self.quantized_inference}] is not implemented"
            )
        for d in (self.compute_dtype, self.param_dtype, self.nima_dtype):
            if d not in ("float32", "bfloat16", "float16"):
                raise ValueError(f"dtype [{d}] is not supported")
        if not (0.0 <= self.g_ema_decay < 1.0):
            raise ValueError(f"g_ema_decay [{self.g_ema_decay}] must be in [0, 1)")
        return self

    # epoch tag used in checkpoint / result filenames: the reference formats a
    # float epoch ('92.0'); published checkpoints use '92'.  Accept both.
    @staticmethod
    def epoch_tag(epoch) -> str:
        f = float(epoch)
        return str(int(f)) if f == int(f) else str(f)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        if isinstance(d.get("gpu_ids"), list):
            d["gpu_ids"] = tuple(d["gpu_ids"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def build_parser() -> argparse.ArgumentParser:
    """CLI mirroring the reference flag-for-flag (reference: config.py:7-83)."""
    p = argparse.ArgumentParser(prog="uegan_tpu")
    d = Config()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = getattr(d, f.name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            p.add_argument(name, type=str2bool, default=default)
        elif isinstance(default, tuple):
            p.add_argument(name, type=int, nargs="*", default=list(default))
        elif isinstance(default, int):
            p.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            p.add_argument(name, type=float, default=default)
        else:
            p.add_argument(name, type=str, default=default)
    return p


def get_config(argv: Optional[List[str]] = None) -> Config:
    ns = build_parser().parse_args(argv)
    d = vars(ns)
    d["gpu_ids"] = tuple(d["gpu_ids"])
    return Config(**d).validate()
