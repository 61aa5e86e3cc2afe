"""Trace analysis helpers for jax.profiler captures.

Workflow (see PERF.md):
    with profiling.trace('/tmp/tb'):
        run_steps()
    report = trace_tools.summarize('/tmp/tb', runs=N)

Parses the trace-viewer JSON (no tensorboard needed). Durations for
container nodes like ``while`` INCLUDE their children — ``summarize``
separates leaf ops from containers to avoid the double-counting trap.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import re

_CONTAINER = ("while", "fusion_wrapper", "jit_", "PjitFunction")
_HOST_PREFIXES = ("$", "np.asarray", "jit__", "PjitFunction")


def load_events(logdir: str) -> list[dict]:
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    return [e for e in tr.get("traceEvents", [])
            if e.get("ph") == "X" and "dur" in e]


def _is_host(name: str) -> bool:
    return any(name.startswith(p) for p in _HOST_PREFIXES)


def _out_shape(long_name: str) -> str:
    m = re.search(r"= (\S+?)\[([\d,]*)\]", long_name)
    return f"{m.group(1)}[{m.group(2)}]" if m else ""


def summarize(logdir: str, runs: int = 1, top: int = 20,
              by: str = "source") -> list[tuple]:
    """Aggregate device-op time per ``by`` ('source' | 'name' | 'shape').

    Returns [(key, ms_per_run, count)] sorted by time. Container nodes
    (``while`` etc.) are excluded from the aggregation so totals are leaf-sums.
    """
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in load_events(logdir):
        name = e.get("name", "")
        if _is_host(name) or name.startswith(_CONTAINER):
            continue
        args = e.get("args", {})
        if by == "source":
            key = args.get("source", name.split(".")[0])
        elif by == "shape":
            key = _out_shape(args.get("long_name", "")) or name.split(".")[0]
        else:
            key = name
        agg[key] += e["dur"]
        cnt[key] += 1
    rows = [(k, d / runs / 1e3, cnt[k]) for k, d in agg.most_common(top)]
    return rows


def print_summary(logdir: str, runs: int = 1, top: int = 20,
                  by: str = "source") -> None:
    rows = summarize(logdir, runs=runs, top=top, by=by)
    total = sum(r[1] for r in rows)
    print(f"top-{top} leaf op-time: {total:.1f} ms/run (by {by})")
    for key, ms, n in rows:
        print(f"{ms:8.2f} ms  x{n:<6d} {key}")
