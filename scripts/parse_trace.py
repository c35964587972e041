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
# device events live on TPU pids; pick the pid with the most total dur
by_pid = collections.Counter()
for e in ev:
    by_pid[e.get("pid")] += e["dur"]
print("pids by total dur:", by_pid.most_common(5), file=sys.stderr)
names = {}
for e in ev:
    # process_name metadata
    pass
agg = collections.Counter()
cnt = collections.Counter()
for e in ev:
    if e.get("pid") != by_pid.most_common(1)[0][0]:
        continue
    n = e["name"]
    agg[n] += e["dur"]
    cnt[n] += 1
tot = sum(agg.values())
print(f"total device-ish time: {tot/1e3:.2f} ms over {sum(cnt.values())} events")
for n, d in agg.most_common(40):
    print(f"{d/1e3:9.3f} ms  {cnt[n]:6d}x  {n[:110]}")
