"""Join a jax.profiler trace with HLO source metadata: time per Python line.

Usage: python scripts/attribute_profile.py /tmp/psdr_trace /tmp/fused_hlo2.txt

Parses the optimized HLO text for ``%op_name = ... metadata={...
source_file="..." source_line=N ...}`` and the trace for per-op device
durations, then aggregates device time by source file:line.  Fusions carry
the metadata of their root instruction, which is usually the right
attribution for "which Python line made XLA materialize this".
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def parse_hlo_sources(hlo_path):
    src = {}
    pat = re.compile(
        r"%(\S+?) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)"
    )
    op_pat = re.compile(r"op_name=\"([^\"]+)\"")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, fname, lineno = m.groups()
            om = op_pat.search(line)
            src[name] = (fname.split("/")[-1], int(lineno),
                         om.group(1) if om else "")
    return src


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    src = parse_hlo_sources(hlo_path)

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    pid_names, tid_names = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    by_line = defaultdict(float)
    by_opname = defaultdict(float)
    unattributed = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        if "XLA Ops" not in tname:
            continue
        name = ev.get("name", "")
        if name.startswith("while"):
            continue  # container; body ops are counted individually
        dur = ev.get("dur", 0) / 1e3
        total += dur
        info = src.get(name)
        if info is None:
            unattributed[name.split(".")[0]] += dur
            continue
        fname, lineno, op = info
        by_line[(fname, lineno)] += dur
        # jax op_name path: strip the leading jit(step)/ and trailing op
        parts = [p for p in op.split("/") if p]
        by_opname["/".join(parts[1:3])] += dur

    print(f"total leaf device time {total:.1f} ms (2 steps)")
    print("-- by source line --")
    for (fname, lineno), ms in sorted(by_line.items(),
                                      key=lambda kv: -kv[1])[:45]:
        print(f"  {ms:8.2f} ms {100 * ms / total:5.1f}%  {fname}:{lineno}")
    print("-- unattributed --")
    for name, ms in sorted(unattributed.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:8.2f} ms {100 * ms / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
