"""Summarise a jax.profiler device trace: top ops by total device time.

Parses ``<dir>/plugins/profile/*/*.trace.json.gz`` (the chrome-trace the TPU
profiler emits through the axon tunnel), keeps the TPU device pid's
"XLA Ops" thread (per-op leaf durations), and aggregates by op name.

  python scripts/trace_report.py /tmp/tr_pallas [--top 40] [--group] [--self]

--group folds op instances (`fusion.123` -> `fusion`) and pallas kernel
instances to one row per kernel.
--self subtracts nested children (ops inside `while`/`fusion` spans) from
each event so scan bodies are not double-counted.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile",
                                   "*", "*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # map: pid -> process name, (pid, tid) -> thread name
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    tpu_pids = {p for p, n in pnames.items()
                if "TPU" in n or "/device" in n}
    op_threads = {(p, t) for (p, t), n in tnames.items()
                  if p in tpu_pids and "XLA Ops" in n}
    return [e for e in events
            if e.get("ph") == "X" and (e["pid"], e.get("tid")) in op_threads]


_INSTANCE = re.compile(r"[.\d]+$")


def self_times(events):
    """Per-event duration minus nested children (same thread, contained
    span) — the classic flame-graph self-time, so `while` scan bodies are
    not double-counted with the ops inside them."""
    by_thread = collections.defaultdict(list)
    for e in events:
        by_thread[(e["pid"], e.get("tid"))].append(e)
    out = []
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event, child_total)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                end, ev, child = stack.pop()
                out.append((ev, ev.get("dur", 0) - child))
                if stack:
                    stack[-1][2] += ev.get("dur", 0)
            stack.append([ts + dur, e, 0])
        while stack:
            end, ev, child = stack.pop()
            out.append((ev, ev.get("dur", 0) - child))
            if stack:
                stack[-1][2] += ev.get("dur", 0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--self", dest="self_time", action="store_true")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    total = collections.Counter()
    count = collections.Counter()
    pairs = (self_times(events) if args.self_time
             else [(e, e.get("dur", 0)) for e in events])
    for e, dur in pairs:
        name = e.get("name", "?")
        if args.group:
            name = _INSTANCE.sub("", name)
        total[name] += dur
        count[name] += 1

    grand = sum(total.values())
    print(f"{'total_ms':>10} {'n':>6} {'%':>6}  op")
    for name, dur in total.most_common(args.top):
        print(f"{dur/1e3:10.2f} {count[name]:6d} {100*dur/grand:6.2f}  "
              f"{name[:110]}")
    print(f"{grand/1e3:10.2f} {sum(count.values()):6d} 100.00  TOTAL")


if __name__ == "__main__":
    main()
