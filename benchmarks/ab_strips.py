"""A/B harness for the H-strip executor (infer/strips.py) on the real chip.

Usage: python benchmarks/ab_strips.py [HW] [B] [slab_unpack_min] [exit_chunks]
           [strip_rows] [int8]

Times make_strip_eval at HW px, batch B, optionally overriding the
per-slab-unpack gate (_SLAB_UNPACK_MIN) and the lax.map exit-chain chunk
size, so gate thresholds can be re-derived after layout/packing changes.
A 6th arg ``int8`` times the int8 strip executor instead (unit-gain
weights so the quantized tensors carry trained-magnitude values).
Prints one img/s line per invocation (3 timed iters after 2 warmups).
"""
import os, time, sys
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

from uegan_tpu.config import Config
import uegan_tpu.infer.strips as strips
from uegan_tpu.infer.packed import make_packed_eval, pack_generator_params
from uegan_tpu.infer.strips import make_strip_eval, pick_strip_rows
from uegan_tpu.train.state import create_train_state

HW = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
slab_min = int(sys.argv[3]) if len(sys.argv) > 3 else None  # override gate
chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 0
if slab_min is not None:
    strips._SLAB_UNPACK_MIN = slab_min

int8 = len(sys.argv) > 6 and sys.argv[6] == "int8"
if "norefix" in sys.argv[6:]:
    # ABLATION (inexact, measurement only): skip the image-border halo
    # re-reflects to bound their cost — the r2 exactness fix this harness
    # exists to price (VERDICT r3 #4)
    strips._refix_outer_slab_halos = lambda t, n, s, edge, c=None: t
    strips._refix_exit_halos = lambda t, n, ids, s_total, m, c: t

cfg = Config(compute_dtype="bfloat16")
state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (HW, HW), steps_per_epoch=1)
dev = jax.devices()[0]
host_params = jax.device_get(state.g_params)
r = int(sys.argv[5]) if len(sys.argv) > 5 else pick_strip_rows(HW // 2, B)
x = jax.device_put(np.random.default_rng(0).uniform(-1, 1, (B, HW, HW, 3)).astype(np.float32), dev)
if int8:
    def _renorm(t):  # unit fan-in gain: trained-magnitude activations
        for k, v in t.items():
            if isinstance(v, dict):
                _renorm(v)
            elif k == "kernel" and np.ndim(v) == 4:
                gain = float(np.std(v)) * np.sqrt(float(np.prod(v.shape[:3])))
                t[k] = v * (1.0 / max(gain, 1e-8))

    from uegan_tpu.infer.quantized import build_quant_tables

    _renorm(host_params)
    tabs = build_quant_tables(bundle, host_params)
    if "entryint8" in sys.argv[6:]:
        tabs["entry_int8"] = True  # re-measure the full-int8 form (the
        # default is the bf16-entry hybrid, 19.76 vs 17.75 at 2048 B=4)
    fq = jax.jit(make_strip_eval(bundle, tabs["pk"], r, chunks, quant=tabs,
                             entry_chunked="entrychunk" in sys.argv[6:]))
    g_params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, host_params), dev)
    f = fq
else:
    g_params = jax.device_put(state.g_params, dev)
    pk = pack_generator_params(host_params, cfg.g_conv_dim)
    f = jax.jit(make_strip_eval(bundle, pk, r, chunks,
                                entry_chunked="entrychunk" in sys.argv[6:]))
out = None
for _ in range(2):
    out = f(g_params, x)
_ = np.asarray(out[0, :1, :1, 0])
t0 = time.perf_counter()
N = 3
for _ in range(N):
    out = f(g_params, x)
_ = np.asarray(out[0, :1, :1, 0])
dt = time.perf_counter() - t0
tag = " int8" if int8 else ""
print(f"{HW}px B={B} r={r} slab_min={strips._SLAB_UNPACK_MIN} chunks={chunks}{tag}: {B*N/dt:.2f} img/s")
