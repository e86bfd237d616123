"""Export the production inference forward as a serialized StableHLO artifact.

Deployment path the reference never had (its serving story was a Flask app
holding a live torch module — metrics/NIMA/nima/inference/app.py): the packed
generator forward, with weights baked in as constants, is lowered once and
serialized via ``jax.export`` — the artifact can be shipped to a serving
fleet and executed without the uegan_tpu package, model code, or checkpoint
files, and it can be lowered for several platforms at once (``--platforms
cpu,tpu``).

Usage:
  python -m uegan_tpu.tools.export_model --out /tmp/uegan_512.jaxexport \
      [--ckpt results/UEGAN-FiveK/models/UEGAN-FiveK_rahinge_92.pth] \
      [--hw 512] [--batch 16] [--quantized int8] [--platforms cpu,tpu]

Load + run (only jax required):
  from uegan_tpu.tools.export_model import load_exported
  fn = load_exported("/tmp/uegan_512.jaxexport")
  out = fn(x)   # (batch, hw, hw, 3) in [-1, 1] -> enhanced, same shape
"""

from __future__ import annotations

import argparse


def export_generator(
    out_path: str,
    ckpt: str = "",
    hw: int = 512,
    batch: int = 16,
    quantized: str = "",
    compute_dtype: str = "bfloat16",
    platforms: tuple = (),
    u8_io: bool = False,
) -> int:
    """Serialize the packed inference forward; returns artifact size in bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from uegan_tpu.config import Config
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype=compute_dtype, quantized_inference=quantized).validate()
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 1)
    if ckpt:
        if ckpt.endswith(".pth"):
            from uegan_tpu.convert.torch_import import import_uegan_checkpoint

            conv = import_uegan_checkpoint(ckpt)
            cast = lambda new, old: jnp.asarray(new, old.dtype)
            state = state.replace(
                g_params=jax.tree_util.tree_map(
                    cast, conv["g_vars"]["params"], state.g_params
                )
            )
        else:
            # accepts EMA-carrying checkpoints; exports the averaged weights
            # when present (Config.ema_eval semantics)
            from uegan_tpu.utils.checkpoint import restore_eval_state

            state = restore_eval_state(ckpt, jax.device_get(state))

    eval_fn = make_fast_eval(bundle, state.g_params, u8_output=u8_io)
    g_params, g_extra = state.g_params, state.g_extra

    if u8_io:
        # serving artifact: uint8 pixels in AND out — the [-1,1] normalize
        # runs on device and the PNG quantize is fused before the final
        # depth_to_space (infer/packed.py), so the host only moves bytes
        from uegan_tpu.data.pipeline import device_normalize

        def forward(x):  # weights closed over -> baked as constants
            return eval_fn(g_params, g_extra, device_normalize(x))

        in_spec = jax.ShapeDtypeStruct((batch, hw, hw, 3), jnp.uint8)
    else:
        def forward(x):
            return eval_fn(g_params, g_extra, x)

        in_spec = jax.ShapeDtypeStruct((batch, hw, hw, 3), jnp.float32)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(jax.jit(forward), **kw)(in_spec)
    blob = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Load a serialized artifact; returns ``fn(x) -> enhanced`` (jittable)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="export-model")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default="", help=".pth or orbax checkpoint dir")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--quantized", default="", help="'' or 'int8'")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--platforms", default="",
                   help="comma list (e.g. cpu,tpu) for multi-platform lowering; "
                        "empty = the current backend only")
    p.add_argument("--platform", default="", help="jax backend override")
    p.add_argument("--u8_io", action="store_true",
                   help="uint8-in/uint8-out serving artifact (device "
                        "normalize + fused PNG quantize)")
    a = p.parse_args(argv)
    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)
    plats = tuple(s for s in a.platforms.split(",") if s)
    n = export_generator(a.out, a.ckpt, a.hw, a.batch, a.quantized,
                         a.compute_dtype, plats, u8_io=a.u8_io)
    print(f"exported {a.hw}px batch-{a.batch} forward to {a.out} ({n / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
