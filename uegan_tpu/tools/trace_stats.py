"""Aggregate per-op device time from a jax.profiler xplane trace.

Observability tooling beyond the reference's wall-clock prints
(reference: trainer.py:174-177; SURVEY.md §5).  ``jax.profiler`` writes
``*.xplane.pb`` files that normally need TensorBoard's profile plugin; the
plugin in this image is version-mismatched with TensorFlow, so this parses
the XSpace proto directly and prints a per-HLO-op self-time table — enough
to find hotspots without a browser.

Usage:
  python -m uegan_tpu.tools.trace_stats /tmp/trace_dir [--top 30] [--group]
  python -m uegan_tpu.tools.trace_stats /tmp/trace_dir --categories

Requires tensorflow (for the xplane proto) — gated import with a clear error.
Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the default C++
protobuf rejects the generated module.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict


def _load_xspace(path: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover - environment-dependent
        raise SystemExit(
            "tensorflow xplane proto unavailable (%s); try "
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python" % e
        )
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def find_xplane(trace_dir: str) -> str:
    hits = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return hits[-1]


_FUSION_RE = re.compile(r"\.\d+$")


def device_op_table(xs, device_substr: str = "TPU", line_substr: str = "XLA Ops"):
    """Aggregate event durations by op name on one device-plane line.

    Returns (rows, total_ps, async_ps): rows are (name, total_ps, count)
    from the line whose name contains ``line_substr``, sorted by time desc.
    The TPU device plane has a SERIAL timeline line ('XLA Ops' — its busy
    time IS wall device time) and an 'Async XLA Ops' line whose copy-start
    DMAs overlap the serial line; summing both double-counts and makes
    copies look dominant.  ``async_ps`` reports the async line's busy time
    separately (DMA-engine pressure, hidden under compute unless ~100%).
    """
    rows = defaultdict(lambda: [0, 0])
    async_ps = 0
    for p in xs.planes:
        if device_substr not in p.name:
            continue
        meta = {m.id: m.name for m in p.event_metadata.values()} if hasattr(
            p.event_metadata, "values"
        ) else {}
        if not meta:
            meta = {mid: m.name for mid, m in p.event_metadata.items()}
        for line in p.lines:
            if "Async" in line.name:
                async_ps += sum(ev.duration_ps for ev in line.events)
                continue
            if line_substr not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                rows[name][0] += ev.duration_ps
                rows[name][1] += 1
        break
    out = [(k, v[0], v[1]) for k, v in rows.items()]
    out.sort(key=lambda r: -r[1])
    return out, sum(r[1] for r in out), async_ps


_CATEGORIES = (
    ("convolution", ("convolution", "conv_")),
    ("matmul/einsum", ("dot", "einsum")),
    ("copy/layout", ("copy", "slice-start", "bitcast", "transpose", "all-to-all")),
    ("dus/border", ("dynamic-update-slice", "dynamic_update_slice")),
    ("pad/select", ("pad", "select", "compare")),
    ("reduce", ("reduce",)),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in _CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="trace-stats")
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--device", default="TPU", help="device plane substring")
    ap.add_argument("--group", action="store_true",
                    help="merge numbered op variants (foo.1, foo.2) into one row")
    ap.add_argument("--categories", action="store_true",
                    help="aggregate by op category (conv / copy / reduce / ...)")
    args = ap.parse_args(argv)

    path = find_xplane(args.trace_dir)
    xs = _load_xspace(path)
    rows, total, async_ps = device_op_table(xs, args.device)
    # module-level wrapper events (jit_<name>) span the whole program on a
    # separate line — drop them from totals so % means share of op time
    rows = [r for r in rows if not r[0].startswith("jit_")]
    total = sum(r[1] for r in rows)
    if args.categories:
        g = defaultdict(lambda: [0, 0])
        for name, ps, n in rows:
            key = categorize(name)
            g[key][0] += ps
            g[key][1] += n
        rows = sorted(((k, v[0], v[1]) for k, v in g.items()), key=lambda r: -r[1])
    if args.group:
        g = defaultdict(lambda: [0, 0])
        for name, ps, n in rows:
            key = _FUSION_RE.sub("", name)
            g[key][0] += ps
            g[key][1] += n
        rows = sorted(((k, v[0], v[1]) for k, v in g.items()), key=lambda r: -r[1])
    print(f"# {path}")
    print(f"# serial device time: {total / 1e9:.3f} ms ('XLA Ops' line; "
          f"async DMA busy {async_ps / 1e9:.3f} ms overlapped)")
    print(f"{'ms':>10}  {'%':>5}  {'n':>5}  op")
    for name, ps, n in rows[: args.top]:
        print(f"{ps / 1e9:10.3f}  {100.0 * ps / max(total, 1):5.1f}  {n:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
