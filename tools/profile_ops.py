"""Capture a jax.profiler trace of a bench leg and print top device ops.

The reference ships ``--profile`` hooks that dump torch/cuda profiler
tables (fairseq/fairseq_cli/train.py); this is the TPU twin for this
framework's bench surfaces: it wraps one steady-state bench iteration in
``jax.profiler`` and aggregates the XLA op durations from the xplane
proto (tensorboard_plugin_profile's xplane schema), so "where do the
milliseconds go" is answerable without a TensorBoard UI.

Usage::

    python tools/profile_ops.py beam     # FusedOneShotBeamDecoder corpus
    python tools/profile_ops.py agent    # CachedFusedGreedyDecoder corpus
    python tools/profile_ops.py train    # CAAT fine-tune step
    python tools/profile_ops.py pretrain # wav2vec-S pre-train step
    python tools/profile_ops.py oneshot  # one-shot greedy corpus

Prints a table of the top-40 device ops by total self time plus
category totals (matmul / elementwise / reduce / copy / infeed).
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict


def _run_leg(name: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    if name == "beam":
        return lambda: bench.beam_bench(n_streams=64, oneshot=True)
    if name == "stream-beam":
        return lambda: bench.beam_bench(n_streams=32, oneshot=False)
    if name == "agent":
        return lambda: bench.agent_bench(decision_step=2)
    if name == "oneshot":
        return lambda: bench.oneshot_bench(decision_step=2)
    if name == "train":
        return lambda: bench.train_bench("flash", iters=3)
    if name == "pretrain":
        return lambda: bench.pretrain_bench(iters=3)
    raise SystemExit(f"unknown leg {name!r}")


def parse_xplane(logdir: str):
    """Aggregate per-op self times from the xplane.pb dump.

    Uses the device plane's "XLA Ops" line (synchronous op self times;
    events on it do not overlap) and reports the "Async XLA Ops" line
    (DMA that overlaps compute) separately via the ``async::`` prefix.
    """
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    totals = defaultdict(float)      # op name -> total us
    counts = defaultdict(int)
    module_us = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if not plane.name.startswith("/device:"):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name == "XLA Modules":
                    module_us += sum(e.duration_ps for e in line.events) / 1e6
                if line.name not in ("XLA Ops", "Async XLA Ops"):
                    continue
                pre = "async::" if line.name == "Async XLA Ops" else ""
                for ev in line.events:
                    nm = pre + ev_meta.get(ev.metadata_id, "?")
                    totals[nm] += ev.duration_ps / 1e6   # ps -> us
                    counts[nm] += 1
    return totals, counts, module_us


CATEGORIES = (
    ("matmul", ("dot", "conv", "fusion.gemm", "einsum")),
    ("copy", ("copy", "transpose", "reshape", "bitcast", "dynamic-update",
              "dynamic_update", "gather", "scatter", "slice", "pad",
              "concatenate")),
    ("reduce", ("reduce", "sort", "top-k", "topk", "cumsum", "scan")),
    ("comm", ("all-reduce", "all-gather", "collective", "infeed", "outfeed",
              "send", "recv")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "elementwise/other"


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    fn = _run_leg(leg)
    fn()  # compile outside the trace

    import jax

    logdir = tempfile.mkdtemp(prefix=f"prof_{leg}_")
    jax.profiler.start_trace(logdir)
    result = fn()
    jax.profiler.stop_trace()
    print(f"bench result: {result}")

    totals, counts, module_us = parse_xplane(logdir)
    sync = {k: v for k, v in totals.items()
            if not k.startswith("async::")}
    grand = sum(sync.values())
    async_us = sum(v for k, v in totals.items() if k.startswith("async::"))
    cats = defaultdict(float)
    for nm, us in sync.items():
        cats[categorize(nm)] += us
    print(f"\ntrace dir: {logdir}")
    print(f"module exec time: {module_us / 1e3:.1f} ms; "
          f"sync op time: {grand / 1e3:.1f} ms; "
          f"async DMA (overlapped): {async_us / 1e3:.1f} ms")
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<18} {us / 1e3:9.1f} ms  ({us / grand * 100:5.1f}%)")
    print(f"\ntop {top_n} ops by self time:")
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    for nm, us in rows:
        print(f"  {us / 1e3:9.2f} ms  x{counts[nm]:<6} {nm[:110]}")


if __name__ == "__main__":
    main()
