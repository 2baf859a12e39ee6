"""Turn a captured jax.profiler trace into a per-op time table.

Usage:
    python scripts/analyze_trace.py /tmp/nm_trace [--top 30]

Reads the newest run under <dir>/plugins/profile/<ts>/ and parses the
chrome-trace export (*.trace.json.gz — stdlib only, no TensorBoard
required).  Aggregates complete ('X') events on device tracks by op name,
prints the top ops and a category rollup (conv / matmul / fusion / copy /
...), which is how the BASELINE.md stage table is produced from hardware.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

CATEGORIES = [
    ("conv", re.compile(r"conv", re.I)),
    ("matmul", re.compile(r"dot|gemm|einsum", re.I)),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic-slice|"
                                  r"dynamic_slice|dynamic-update", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce|allreduce", re.I)),
    ("loop/while", re.compile(r"while|scan|body", re.I)),
    ("fusion (other)", re.compile(r"fusion", re.I)),
]


def find_trace_files(root: str) -> list[str]:
    runs = sorted(glob.glob(os.path.join(root, "plugins", "profile", "*")))
    if not runs:
        runs = [root]
    return sorted(glob.glob(os.path.join(runs[-1], "*.trace.json.gz")))


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nm_trace"
    top_n = int(sys.argv[sys.argv.index("--top") + 1]) \
        if "--top" in sys.argv else 30

    files = find_trace_files(root)
    if not files:
        sys.exit(f"no *.trace.json.gz under {root} (run "
                 "scripts/bench_breakdown.py --trace <dir> or train.py "
                 "--profile_dir <dir> first)")

    # process-id -> name, to keep only device (TPU/accelerator) tracks;
    # (pid, tid) -> thread name, to keep only LEAF op rows ("XLA Ops")
    # and not the containing module/step spans which double-count the
    # whole program as a single event (the former 67%-"other" artifact).
    proc_names: dict[int, str] = {}
    thread_names: dict[tuple, str] = {}
    events = []
    for f in files:
        for e in load_events(f):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                proc_names[e["pid"]] = e.get("args", {}).get("name", "")
            elif e.get("ph") == "M" and e.get("name") == "thread_name":
                thread_names[(e["pid"], e.get("tid"))] = \
                    e.get("args", {}).get("name", "")
            elif e.get("ph") == "X":
                events.append(e)

    def is_device(pid: int) -> bool:
        name = proc_names.get(pid, "")
        return bool(re.search(r"TPU|GPU|/device:|XLA Op|Steps", name, re.I))

    device_pids = {p for p in proc_names if is_device(p)}
    if not device_pids:  # CPU backend traces: keep everything
        device_pids = set(proc_names) or {e["pid"] for e in events}

    op_threads = {k for k, v in thread_names.items()
                  if re.search(r"XLA Ops", v, re.I) and k[0] in device_pids}

    by_op = defaultdict(float)
    op_flops = defaultdict(float)
    op_bytes = defaultdict(float)
    op_shape: dict[str, str] = {}
    total = 0.0
    for e in events:
        if e["pid"] not in device_pids:
            continue
        if op_threads and (e["pid"], e.get("tid")) not in op_threads:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        if dur <= 0:
            continue
        by_op[e["name"]] += dur
        total += dur
        args = e.get("args") or {}
        try:
            op_flops[e["name"]] += float(args.get("model_flops", 0))
        except (TypeError, ValueError):
            pass
        try:
            op_bytes[e["name"]] += float(args.get("raw_bytes_accessed", 0))
        except (TypeError, ValueError):
            pass
        if e["name"] not in op_shape and "shape_with_layout" in args:
            op_shape[e["name"]] = re.sub(r"\{[^}]*\}", "",
                                         args["shape_with_layout"])

    if not by_op:
        sys.exit("no device events found in the trace")

    by_cat = defaultdict(float)
    for name, dur in by_op.items():
        for cat, pat in CATEGORIES:
            if pat.search(name):
                by_cat[cat] += dur
                break
        else:
            by_cat["other"] += dur

    print(f"# {len(files)} trace file(s) under {root}; total device time "
          f"{total / 1e3:.2f} ms (all iterations summed)")
    print(f"\n{'category':20s} {'ms':>10s} {'%':>6s}")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:20s} {dur / 1e3:10.2f} {100 * dur / total:6.1f}")

    print(f"\n{'top op':44s} {'ms':>9s} {'%':>6s} {'TF/s':>7s} "
          f"{'GB/s':>7s}  shape")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        tfs = op_flops[name] / (dur * 1e-6) / 1e12 if dur else 0.0
        gbs = op_bytes[name] / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"{name[:44]:44s} {dur / 1e3:9.2f} {100 * dur / total:6.1f} "
              f"{tfs:7.1f} {gbs:7.1f}  {op_shape.get(name, '')[:40]}")


if __name__ == "__main__":
    main()
