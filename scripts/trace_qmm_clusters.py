"""(dev tool) Cluster per-call-site qmm device times from a bench.py
--profile trace: prints us/step per cluster so each projection's
effective bandwidth can be read off against its known byte count.

Usage: python scripts/trace_qmm_clusters.py /tmp/trace1 [steps=128]
"""
import collections
import glob
import gzip
import json
import sys

path = glob.glob(sys.argv[1] + "/**/*.trace.json.gz", recursive=True)[0]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
with gzip.open(path, "rt") as f:
    data = json.load(f)
pnames = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
          if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
dev = [p for p, n in pnames.items() if "TPU" in n]
ev = [e for e in data["traceEvents"]
      if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev]
agg = collections.Counter()
kind = collections.Counter()
for e in ev:
    n = e["name"]
    if n.startswith("_qmm_call"):
        agg[n] += e["dur"]
    else:
        import re

        kind[re.sub(r"[.\d]+$", "", n)] += e["dur"]
clusters = collections.Counter(round(d / steps) for d in agg.values())
print(f"{len(agg)} qmm sites, {sum(agg.values())/steps/1e3:.3f} ms/step total")
for us, n in sorted(clusters.items()):
    print(f"  ~{us:4d} us/step x {n:3d} sites = {us*n/1000:.3f} ms/step")
print("other op kinds (ms/step):")
for n, d in kind.most_common(10):
    if n.startswith("jit_") or n == "while":
        continue
    print(f"  {d/steps/1e3:8.4f}  {n[:70]}")
