#!/bin/bash
# Full local gate: compile, specs, oracle verify (sf0.01), bench (sf0.1).
# Mirrors the driver's t1/t2/bench checks — run before any commit that
# touches query surface. Usage: tools/gate.sh [sfdir-for-verify]
#
# The gate REFUSES (round-8 lesson: the round shipped red silently) when
#  - any bench query fails (BENCH failed list non-empty), or
#  - the verified-query count SHRANK vs the last driver round
#    (CORRECTNESS_r*.json) — a regeneration/loader drift eats queries
#    silently because Verify skips throwers.
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
sbt -batch compile
sbt -batch test
rm -rf /tmp/graft_gate
sbt -batch "runMain graft.Verify $SF /tmp/graft_gate"
python3 tools/compare_oracle.py "$SF" /tmp/graft_gate
python3 - <<'EOF2'
import json, glob, os, re, sys
# count RESULT DIRS, not oracle_sql.json entries: Verify dumps the full
# oracle map even when a query throws, so only the written outputs tell
# the truth about what ran
runs = sum(os.path.isdir(p) for p in glob.glob('/tmp/graft_gate/*'))
prev_files = sorted(glob.glob('CORRECTNESS_r*.json'),
                    key=lambda p: int(re.search(r'r(\d+)', p).group(1)))
# compare against the best (max) prior round, not just the last: r8's own
# truncated file must not lower the bar for r9
prev = max((len(json.load(open(p))) for p in prev_files), default=0)
print(f"gate: {runs} queries verified (prior-round max: {prev})")
if runs < prev:
    print(f"GATE RED: verified-query count shrank {prev} -> {runs} — "
          f"queries are silently failing (Verify skips throwers)")
    sys.exit(1)
EOF2
rm -f /tmp/graft_bench.json   # never report a stale bench as green
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_OUT=/tmp/graft_bench.json \
  sbt -batch "runMain graft.Bench" > /dev/null
python3 - <<'EOF2'
import json, sys
d = json.load(open('/tmp/graft_bench.json'))
print(f"bench: {d['value']:.1f}s steady / {d['cold_total']:.1f}s cold over {len(d['queries'])} queries")
for k, v in sorted(d['queries'].items(), key=lambda kv: -kv[1])[:5]:
    print(f"  {k:26s} {v:.2f}s warm")
if d.get('failed'):
    print(f"GATE RED: bench queries FAILED: {d['failed']}")
    sys.exit(1)
if d.get('warm_gt_cold'):
    print(f"gate: WARNING timing suspect (warm>cold): {d['warm_gt_cold']} — "
          f"numbers unreliable, rerun on a quiet box")
if d.get('steal_flagged'):
    print(f"gate: WARNING measured under steal bursts: {d['steal_flagged']} — "
          f"these entries are contention, not code; rerun on a quiet box")
EOF2
echo "GATE GREEN"
