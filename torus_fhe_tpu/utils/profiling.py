"""Tracing / profiling aux subsystem (SURVEY §5: per-kernel breakdown).

The reference instruments with wall-clock `@elapsed` / BenchmarkTools
(3-gen-mk-tfhe/perf_comp.jl, measurements/*); on TPU the equivalent
ground truth is an XLA device trace. This module wraps `jax.profiler` so any
flow can be traced with one context manager, and adds a trace-event
summariser that turns the captured .trace.json.gz into a per-op-category
time breakdown (MXU matmul vs VPU elementwise vs copy/infeed) — the roofline
evidence VERDICT round 1 asked for.

Usage:
    with device_trace("/tmp/trace"):
        out = step(ck, cx, cy); out.b.block_until_ready()
    print(summarize_trace("/tmp/trace"))
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX/XLA profiler trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink: dict | None = None):
    """Wall-clock section timer (the reference's `@elapsed`); records into
    ``sink[label]`` seconds if given, else prints."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = sink.get(label, 0.0) + dt
    else:
        print(f"[timed] {label}: {dt:.4f}s")


def _trace_files(logdir: str):
    return glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True)


_CATEGORIES = (
    ("fusion", "fusion/elementwise"),
    ("dot", "matmul (MXU)"),
    ("conv", "conv (MXU)"),
    ("custom-call", "custom call (pallas kernel)"),
    ("copy", "copy/layout"),
    ("dynamic-update", "dynamic update"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("infeed", "host transfer"),
    ("outfeed", "host transfer"),
)


def summarize_trace(logdir: str, top: int = 15) -> dict:
    """Aggregate device-side trace events by op name.

    Returns {"total_device_us", "by_op": [(name, us, pct)], "by_category"}.
    Only events on device lanes (TensorCore / XLA Ops planes) are counted.
    """
    files = _trace_files(logdir)
    if not files:
        raise FileNotFoundError(f"no .trace.json.gz under {logdir}")
    op_us: dict[str, float] = defaultdict(float)
    for path in files:
        with gzip.open(path, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # find process ids whose name says device/XLA Ops
        dev_pids = set()
        op_tids = {}  # pid -> set of op-lane tids (excludes Modules/Steps)
        for ev in events:
            if ev.get("ph") != "M":
                continue
            nm = ev.get("args", {}).get("name", "")
            if ev.get("name") == "process_name":
                # TPU: per-device TensorCore planes; CPU backend: '/host:CPU'
                if any(k in nm for k in ("TPU", "XLA Ops", "Device",
                                         "/device:", "/host:")):
                    dev_pids.add(ev.get("pid"))
            elif ev.get("name") == "thread_name":
                # 'XLA Modules'/'Steps' lanes span the per-op events on the
                # 'XLA Ops'/TensorCore lanes; counting them double-counts.
                # CPU backend: compute runs on the tf_XLAEigen worker pool.
                if (any(k in nm for k in ("XLA Ops", "TensorCore", "Ops",
                                          "XLAEigen"))
                        and "Module" not in nm and "Step" not in nm):
                    op_tids.setdefault(ev.get("pid"), set()).add(ev.get("tid"))
        # when any plane exposes true op lanes (TPU 'XLA Ops' / CPU Eigen
        # workers), count ONLY those — a pid with no op lane (e.g. the
        # '/host:CPU' python lane next to a TPU plane) would otherwise leak
        # host wall-time spans into the device total
        have_op_lanes = any(op_tids.get(p) for p in dev_pids)
        for ev in events:
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                tids = op_tids.get(ev.get("pid"))
                if tids is None:
                    if have_op_lanes:
                        continue
                elif ev.get("tid") not in tids:
                    continue  # an enclosing Modules/Steps span, not an op
                op_us[ev.get("name", "?")] += float(ev.get("dur", 0.0))
    total = sum(op_us.values())
    by_op = sorted(op_us.items(), key=lambda kv: -kv[1])[:top]
    by_cat: dict[str, float] = defaultdict(float)
    for name, us in op_us.items():
        low = name.lower()
        for key, cat in _CATEGORIES:
            if key in low:
                by_cat[cat] += us
                break
        else:
            by_cat["other"] += us
    return {
        "total_device_us": round(total, 1),
        "by_op": [(n, round(us, 1), round(100 * us / total, 1) if total else 0)
                  for n, us in by_op],
        "by_category": {k: round(v, 1) for k, v in
                        sorted(by_cat.items(), key=lambda kv: -kv[1])},
    }


def format_summary(summary: dict) -> str:
    lines = [f"device total: {summary['total_device_us']/1e3:.2f} ms"]
    lines.append("by category:")
    for cat, us in summary["by_category"].items():
        lines.append(f"  {cat:28s} {us/1e3:10.2f} ms")
    lines.append("top ops:")
    for name, us, pct in summary["by_op"]:
        lines.append(f"  {pct:5.1f}%  {us/1e3:9.2f} ms  {name[:80]}")
    return "\n".join(lines)
