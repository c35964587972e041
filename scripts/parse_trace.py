"""(dev tool) Parse a jax.profiler trace (trace.json.gz) and print the
top device-time consumers grouped by op name prefix."""
import gzip, json, sys, collections, glob

paths = glob.glob(sys.argv[1] + "/**/*.trace.json.gz", recursive=True) or \
        glob.glob(sys.argv[1] + "/**/trace.json.gz", recursive=True)
if not paths:
    print("no trace.json.gz under", sys.argv[1]); sys.exit(1)
with gzip.open(paths[0], "rt") as f:
    data = json.load(f)
ev = [e for e in data.get("traceEvents", [])
      if e.get("ph") == "X" and e.get("dur")]
# device events live on TPU pids — find them via process_name metadata
# (python host frames contain '$file.py:line' names; exclude that pid)
pnames = {e["pid"]: e["args"].get("name", "") for e in data.get("traceEvents", [])
          if e.get("ph") == "M" and e.get("name") == "process_name"
          and "args" in e}
by_pid = collections.Counter()
for e in ev:
    by_pid[e.get("pid")] += e["dur"]
print("pids:", [(p, pnames.get(p, "?"), round(d / 1e3)) for p, d in
                by_pid.most_common(6)], file=sys.stderr)
want_pid = None
if len(sys.argv) > 2:
    want_pid = int(sys.argv[2])
else:
    for p, _ in by_pid.most_common():
        nm = pnames.get(p, "")
        if "TPU" in nm or "/device" in nm.lower():
            want_pid = p
            break
    if want_pid is None:  # fall back: top pid without python host frames
        for p, _ in by_pid.most_common():
            if not any(e["name"].startswith("$") for e in ev
                       if e.get("pid") == p):
                want_pid = p
                break
    if want_pid is None:
        want_pid = by_pid.most_common(1)[0][0]
agg = collections.Counter()
cnt = collections.Counter()
for e in ev:
    if e.get("pid") != want_pid:
        continue
    n = e["name"]
    agg[n] += e["dur"]
    cnt[n] += 1
tot = sum(agg.values())
print(f"total device-ish time: {tot/1e3:.2f} ms over {sum(cnt.values())} events")
for n, d in agg.most_common(40):
    print(f"{d/1e3:9.3f} ms  {cnt[n]:6d}x  {n[:110]}")
