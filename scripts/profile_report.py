"""Summarize a jax.profiler trace: where the device milliseconds live.

Parses the trace-viewer JSON (vm.trace.json.gz) written by
jax.profiler.trace and aggregates the "XLA Ops" timeline per op
category and per named fusion, over the LAST occurrence of the given
module to skip warmup/donation shuffles.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_report.py \
      /tmp/jaxprof [--top 40] [--group]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    return d["traceEvents"]


def xla_op_events(events):
    """Complete events on the 'XLA Ops' thread of the TPU device."""
    tids = {}
    dev_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"]["name"]:
                dev_pid = e["pid"]
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e["pid"] == dev_pid:
            tids[e["tid"]] = e["args"]["name"]
    ops_tid = [t for t, n in tids.items() if n == "XLA Ops"]
    mod_tid = [t for t, n in tids.items() if n == "XLA Modules"]
    ops = [e for e in events if e.get("ph") == "X" and e.get("pid") == dev_pid
           and e.get("tid") in ops_tid]
    mods = [e for e in events if e.get("ph") == "X" and e.get("pid") == dev_pid
            and e.get("tid") in mod_tid]
    return ops, mods


CATS = [
    ("conv", re.compile(r"^convolution|conv_general|%?conv")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("custom", re.compile(r"custom-call|tpu_custom_call")),
    ("dot", re.compile(r"^dot")),
    ("copy", re.compile(r"^copy|bitcast|transpose|reshape")),
    ("dynslice", re.compile(r"dynamic.?(update.?)?slice")),
    ("reduce", re.compile(r"^reduce")),
    ("allreduce", re.compile(r"all-reduce|all-gather|collective")),
]


def categorize(name):
    for cat, rx in CATS:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--module", default=None,
                    help="substring of the XLA module to report (default: longest)")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    ops, mods = xla_op_events(events)
    if not mods:
        print("no module events; reporting all ops")
        window = None
    else:
        if args.module:
            cand = [m for m in mods if args.module in m["name"]]
        else:
            cand = mods
        m = max(cand, key=lambda e: e["dur"])
        window = (m["ts"], m["ts"] + m["dur"])
        print(f"module: {m['name']}  dur={m['dur'] / 1e3:.3f} ms")

    sel = [e for e in ops if window is None
           or (e["ts"] >= window[0] and e["ts"] < window[1])]
    total = sum(e["dur"] for e in sel)
    print(f"{len(sel)} ops, {total / 1e3:.3f} ms on XLA Ops timeline")

    bycat = defaultdict(float)
    byname = defaultdict(lambda: [0.0, 0])
    for e in sel:
        bycat[categorize(e["name"])] += e["dur"]
        byname[e["name"]][0] += e["dur"]
        byname[e["name"]][1] += 1

    print("\n-- by category --")
    for cat, dur in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:10s} {dur / 1e3:9.3f} ms  {100 * dur / total:5.1f}%")

    print(f"\n-- top {args.top} ops --")
    rows = sorted(byname.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur / 1e3:9.3f} ms  x{cnt:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
