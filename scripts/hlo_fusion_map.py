"""Map HLO fusion instruction names to the ops inside their fused
computations, so trace_summary.py op names can be attributed.

Usage: python scripts/hlo_fusion_map.py /tmp/train_step_hlo.txt fusion.24 ...
With no fusion names: prints every fusion with its op census (sorted by
name), plus metadata op_name hints (the JAX source op) when present.
"""
import collections
import re
import sys


def parse(path):
    comps = {}  # computation name -> list of (op, meta)
    cur = None
    op_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\w[\w\-]*)\(")
    meta_re = re.compile(r'op_name="([^"]+)"')
    comp_re = re.compile(r"^%?([\w.\-]+)\s+(?:\([^)]*\)\s*->|\{)")
    fusions = {}  # fusion instr name -> computation called
    fusion_re = re.compile(
        r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*calls=%?([\w.\-]+)")
    for line in open(path):
        m = comp_re.match(line)
        if m and ("{" in line or "->" in line) and "=" not in line.split("{")[0]:
            cur = m.group(1)
            comps.setdefault(cur, [])
            continue
        m = fusion_re.search(line)
        if m:
            fusions[m.group(1)] = m.group(2)
        m = op_re.match(line)
        if m and cur is not None:
            meta = meta_re.search(line)
            comps[cur].append((m.group(2), meta.group(1) if meta else ""))
    return comps, fusions


INTERESTING = {"convolution", "dot", "sort", "scatter", "gather",
               "dynamic-slice", "dynamic-update-slice", "reduce-window",
               "all-reduce", "transpose", "iota", "rng-bit-generator"}


def describe(comps, called):
    ops = comps.get(called, [])
    census = collections.Counter(op for op, _ in ops)
    hits = [(op, meta) for op, meta in ops if op in INTERESTING and meta]
    return census, hits[:4]


def main():
    path = sys.argv[1]
    names = sys.argv[2:]
    comps, fusions = parse(path)
    targets = names or sorted(fusions)
    for name in targets:
        called = fusions.get(name) or fusions.get(name.lstrip("%"))
        if not called:
            print(f"{name}: <not a fusion or not found>")
            continue
        census, hits = describe(comps, called)
        top = ", ".join(f"{o}x{c}" for o, c in census.most_common(6))
        print(f"{name} -> {called}: {top}")
        for op, meta in hits:
            print(f"    {op}: {meta[:110]}")


if __name__ == "__main__":
    main()
