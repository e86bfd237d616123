"""Host input-pipeline benchmark: what the loader ACTUALLY feeds (VERDICT r4 #2).

Every prior train bench fed synthetic device-resident arrays, so the 11.6
steps/s headline silently assumed the host loader could deliver ~232 decoded
+augmented images/s on this ONE-core host.  This measures it:

1. loader-standalone throughput (images/s, counting both pair halves) over
   FiveK-SIZED synthetic photos (default 2992x2000 ~ 6 Mpx), sweeping
   emit=float32|uint8, num_workers, cache_decoded (epoch 2 = cache hot);
2. the same loader over data prepped by tools/prep_train_data.py
   (offline short-side resize — decode cost scales with stored pixels);
3. e2e: the REAL jitted train step (256px b10, the BASELINE config-3 shape)
   fed from disk via InputFetcher, for raw-size and prepped data — the
   achieved steps/s next to the synthetic number.

Writes benchmarks/INPUT_PIPELINE_r5.json.  Usage:
  python benchmarks/input_pipeline.py [--n 16] [--hw 2992x2000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_pairs: int, h: int, w: int) -> None:
    """n_pairs FiveK-sized photo-like PNGs per domain (smooth content — the
    decode cost of noise PNGs is unrepresentative: they barely compress)."""
    import numpy as np
    from PIL import Image

    from uegan_tpu.tools.convergence_fixture import enhance_op, synth_photo

    rng = np.random.default_rng(11)
    for domain in ("exp", "raw"):
        os.makedirs(os.path.join(root, domain), exist_ok=True)
    for i in range(n_pairs):
        # synth at a coarse square then resize to the target aspect: keeps
        # generation O(minutes) while the DECODE cost (what we measure)
        # is set by the stored pixel count, not generation fidelity
        base = synth_photo(rng, 1024)
        img = Image.fromarray((base * 255 + 0.5).astype("uint8")).resize(
            (w, h), Image.BILINEAR)
        img.save(os.path.join(root, "raw", f"img{i:03d}.png"))
        arr = enhance_op((np.asarray(img, "float32") / 255.0))
        Image.fromarray((arr * 255 + 0.5).astype("uint8")).save(
            os.path.join(root, "exp", f"img{i:03d}.png"))


def bench_loader(root: str, emit: str, workers: int, cache: bool,
                 epochs: int = 1, batch: int = 10,
                 image_size: int = 512, resize_size: int = 256):
    """One-config loader throughput: images/s (= 2 x pairs/s), last epoch."""
    from uegan_tpu.data.pipeline import get_train_loader

    loader = get_train_loader(
        root, img_size=image_size, resize_size=resize_size, batch_size=batch,
        shuffle=True, num_workers=workers, drop_last=False, seed=1990,
        cache_decoded=cache, emit=emit,
    )
    rate = 0.0
    for _ in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["img_raw"].shape[0] * 2  # exp + raw both decoded
        rate = n / (time.perf_counter() - t0)
    return round(rate, 2)


def bench_train_from_disk(root: str, iters: int, batch: int = 10,
                          hw: int = 256, workers: int = 8,
                          cache: bool = True, emit: str = "uint8"):
    """Achieved steps/s of the real jitted train step fed from disk."""
    import jax
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.data.pipeline import InputFetcher, get_train_loader
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.parallel.sharding import batch_sharding, replicated
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_train_step

    cfg = Config(compute_dtype="bfloat16", train_batch_size=batch)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 100)
    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(bundle), donate_argnums=(0,))
    loader = get_train_loader(
        root, img_size=512, resize_size=hw, batch_size=batch, shuffle=True,
        num_workers=workers, drop_last=True, seed=1990, cache_decoded=cache,
        emit=emit,
    )
    fetcher = InputFetcher(loader, batch_sharding(mesh))
    b = next(fetcher)
    state, m, _ = step(state, b["img_raw"], b["img_exp"])
    np.asarray(m["D/Total"])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        b = next(fetcher)
        state, m, _ = step(state, b["img_raw"], b["img_exp"])
    np.asarray(m["D/Total"])
    return round(iters / (time.perf_counter() - t0), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="pairs per dataset")
    ap.add_argument("--hw", default="2992x2000")
    ap.add_argument("--quick", action="store_true",
                    help="skip the e2e train-from-disk section")
    ap.add_argument("--out", default="benchmarks/INPUT_PIPELINE_r5.json")
    ap.add_argument("--root", default="", help="reuse a dataset dir")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from uegan_tpu.tools.prep_train_data import prep_folder

    tmp = args.root or tempfile.mkdtemp(prefix="uegan_input_bench_")
    raw_root = os.path.join(tmp, "train")
    prep_root = os.path.join(tmp, "train_prepped")
    if not os.path.isdir(os.path.join(raw_root, "raw")):
        print(f"=== generating {args.n} {h}x{w} pairs under {tmp} ===")
        make_dataset(raw_root, args.n, h, w)
        t0 = time.perf_counter()
        n = prep_folder(raw_root, prep_root, short_side=768)
        print(f"=== prep tool: {n} images in {time.perf_counter() - t0:.1f}s ===")

    results = {"dataset": {"pairs": args.n, "size": f"{h}x{w}"}}
    loader_rows = []
    for name, root, emit, workers, cache, epochs in [
        ("raw f32 w4",        raw_root,  "float32", 4, False, 1),
        ("raw u8 w1",         raw_root,  "uint8",   1, False, 1),
        ("raw u8 w4",         raw_root,  "uint8",   4, False, 1),
        ("raw u8 w8",         raw_root,  "uint8",   8, False, 1),
        ("raw u8 w4 cache",   raw_root,  "uint8",   4, True,  2),
        ("prep f32 w4",       prep_root, "float32", 4, False, 1),
        ("prep u8 w4",        prep_root, "uint8",   4, False, 1),
        ("prep u8 w8",        prep_root, "uint8",   8, False, 1),
        ("prep u8 w4 cache",  prep_root, "uint8",   4, True,  2),
    ]:
        r = bench_loader(root, emit, workers, cache, epochs)
        loader_rows.append({"variant": name, "img_per_s": r})
        print(json.dumps(loader_rows[-1]), flush=True)
    results["loader"] = loader_rows

    if not args.quick:
        train_rows = []
        need = 10 * 16  # iters * batch + warmup margin: epochs of 16 pairs
        for name, root, cache in [
            ("train 256px b10 from RAW-size disk", raw_root, False),
            ("train 256px b10 from RAW-size disk cached", raw_root, True),
            ("train 256px b10 from PREPPED disk", prep_root, False),
            ("train 256px b10 from PREPPED disk cached", prep_root, True),
        ]:
            r = bench_train_from_disk(root, iters=16, cache=cache)
            train_rows.append({"variant": name, "steps_per_s": r})
            print(json.dumps(train_rows[-1]), flush=True)
        results["train_e2e"] = train_rows
        results["train_synthetic_reference_steps_per_s"] = (
            "11.61 (benchmarks/RESULTS_r4.json config 3 — device-resident data)")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"=== written {args.out} ===")


if __name__ == "__main__":
    main()
