"""Summarize a jax.profiler perfetto trace: top device ops by total time.

Usage: python scripts/trace_summary.py /tmp/jtrace_train [top_n]
Picks the newest plugins/profile/*/ dir, reads *.trace.json.gz, sums
'X' (complete) event durations per op name on device tracks, and prints
the top entries plus buckets by op family.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace_train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    runs = sorted(glob.glob(os.path.join(root, "plugins/profile/*")))
    if not runs:
        sys.exit(f"no profile runs under {root}")
    run = runs[-1]
    paths = [p for p in glob.glob(os.path.join(run, "*.trace.json.gz"))]
    if not paths:
        sys.exit(f"no trace.json.gz in {run}")
    with gzip.open(paths[0]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])

    # identify device-side process ids (TPU/TensorCore tracks)
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if any(s in n for s in ("TPU", "Tensor", "/device:", "XLA Op")):
                dev_pids.add(e["pid"])

    per_op = collections.Counter()
    n_ev = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith(("$", "np", "PjitFunction", "jit_")):
            continue
        if re.fullmatch(r"\d+", name):
            continue  # per-step markers (each spans the whole step)
        per_op[name] += e["dur"]
        n_ev[name] += 1

    total = sum(per_op.values())
    print(f"run: {run}\ndevice total: {total/1e3:.2f} ms "
          f"across {sum(n_ev.values())} events\n")
    print(f"{'ms':>9} {'%':>5} {'n':>5}  op")
    for name, us in per_op.most_common(top_n):
        print(f"{us/1e3:9.2f} {100*us/max(total,1):5.1f} {n_ev[name]:5d}"
              f"  {name[:100]}")

    fam = collections.Counter()
    for name, us in per_op.items():
        base = re.sub(r"[.\d]+$", "", name)
        fam[base] += us
    print("\nby family:")
    for name, us in fam.most_common(25):
        print(f"{us/1e3:9.2f} {100*us/max(total,1):5.1f}  {name[:80]}")


if __name__ == "__main__":
    main()
