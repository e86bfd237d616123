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
    rows = defaultdict(lambda: [0, 0, None, 0, 0])  # ps, n, hlo_cat, flops, bytes
    async_ps = 0
    for p in xs.planes:
        if device_substr not in p.name:
            continue
        meta = {mid: m for mid, m in p.event_metadata.items()}
        smeta = {sid: s.name for sid, s in p.stat_metadata.items()}

        def op_stats(m):
            """(hlo_category, flops, bytes_accessed) from XLA's own per-op
            metadata stats — authoritative, unlike name heuristics."""
            cat, fl, by = None, 0, 0
            for s in m.stats:
                key = smeta.get(s.metadata_id, "")
                if key == "hlo_category":
                    cat = s.str_value
                elif key == "flops":
                    fl = s.int64_value
                elif key == "bytes_accessed":
                    by = s.int64_value
            return cat, fl, by

        for line in p.lines:
            if "Async" in line.name:
                async_ps += sum(ev.duration_ps for ev in line.events)
                continue
            if line_substr not in line.name:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m is not None else str(ev.metadata_id)
                r = rows[name]
                r[0] += ev.duration_ps
                r[1] += 1
                if r[2] is None and m is not None:
                    r[2], r[3], r[4] = op_stats(m)
        break
    # flops/bytes are PER-EXECUTION metadata: scale by the event count
    out = [(k, v[0], v[1], v[2] or "?", (v[3] or 0) * v[1], (v[4] or 0) * v[1])
           for k, v in rows.items()]
    out.sort(key=lambda r: -r[1])
    return out, sum(r[1] for r in out), async_ps


# NOTE: category attribution comes from XLA's own per-op `hlo_category`
# stat (see device_op_table) — name-keyword heuristics were retired after
# they mislabeled pad-fused convs whose HLO text mentions copy operands,
# inflating the copy/layout share to 60-75%.


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="trace-stats")
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--device", default="TPU", help="device plane substring")
    ap.add_argument("--group", action="store_true",
                    help="merge numbered op variants (foo.1, foo.2) into one row")
    ap.add_argument("--categories", action="store_true",
                    help="aggregate by XLA's own hlo_category with achieved "
                         "TF/s and GB/s per category (the roofline view)")
    ap.add_argument("--steps", type=int, default=0,
                    help="number of profiled steps: also print per-step time")
    args = ap.parse_args(argv)

    path = find_xplane(args.trace_dir)
    xs = _load_xspace(path)
    rows, total, async_ps = device_op_table(xs, args.device)
    # module-level wrapper events (jit_<name>) span the whole program on a
    # separate line — drop them from totals so % means share of op time
    rows = [r for r in rows if not r[0].startswith("jit_")]
    total = sum(r[1] for r in rows)
    print(f"# {path}")
    print(f"# serial device time: {total / 1e9:.3f} ms ('XLA Ops' line; "
          f"async DMA busy {async_ps / 1e9:.3f} ms overlapped)")
    if args.steps:
        print(f"# per step ({args.steps}): {total / 1e9 / args.steps:.3f} ms")
    if args.categories:
        g = defaultdict(lambda: [0, 0, 0, 0])
        for name, ps, n, cat, fl, by in rows:
            r = g[cat]
            r[0] += ps
            r[1] += n
            r[2] += fl
            r[3] += by
        print(f"{'ms':>10}  {'%':>5}  {'n':>6}  {'TF/s':>7}  {'GB/s':>7}  hlo_category")
        for cat, (ps, n, fl, by) in sorted(g.items(), key=lambda kv: -kv[1][0]):
            sec = ps / 1e12
            tfs = fl / sec / 1e12 if sec else 0.0
            gbs = by / sec / 1e9 if sec else 0.0
            print(f"{ps / 1e9:10.3f}  {100.0 * ps / max(total, 1):5.1f}  {n:6d}  "
                  f"{tfs:7.1f}  {gbs:7.0f}  {cat}")
        return
    if args.group:
        g = defaultdict(lambda: [0, 0, "?", 0, 0])
        for name, ps, n, cat, fl, by in rows:
            key = _FUSION_RE.sub("", name)
            r = g[key]
            r[0] += ps
            r[1] += n
            r[2] = cat
            r[3] += fl
            r[4] += by
        rows = sorted(((k, v[0], v[1], v[2], v[3], v[4]) for k, v in g.items()),
                      key=lambda r: -r[1])
    print(f"{'ms':>10}  {'%':>5}  {'n':>5}  {'TF/s':>7}  {'GB/s':>7}  op [category]")
    for name, ps, n, cat, fl, by in rows[: args.top]:
        sec = ps / 1e12
        tfs = fl / sec / 1e12 if sec else 0.0
        gbs = by / sec / 1e9 if sec else 0.0
        print(f"{ps / 1e9:10.3f}  {100.0 * ps / max(total, 1):5.1f}  {n:5d}  "
              f"{tfs:7.1f}  {gbs:7.0f}  [{cat}] {name[:95]}")


if __name__ == "__main__":
    main()
