#!/bin/bash
# Full local gate: compile, specs, oracle verify (sf0.01), bench (sf0.1).
# Mirrors the driver's t1/t2/bench checks — run before any commit that
# touches query surface. Usage: tools/gate.sh [sfdir-for-verify]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
sbt -batch compile
sbt -batch test
rm -rf /tmp/graft_gate
sbt -batch "runMain graft.Verify $SF /tmp/graft_gate"
python3 tools/compare_oracle.py "$SF" /tmp/graft_gate
rm -f /tmp/graft_bench.json   # never report a stale bench as green
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_OUT=/tmp/graft_bench.json \
  sbt -batch "runMain graft.Bench" > /dev/null
python3 - <<'EOF'
import json
d = json.load(open('/tmp/graft_bench.json'))
print(f"bench: {d['value']:.1f}s steady / {d['cold_total']:.1f}s cold over {len(d['queries'])} queries")
for k, v in sorted(d['queries'].items(), key=lambda kv: -kv[1])[:5]:
    print(f"  {k:26s} {v:.2f}s warm")
EOF
echo "GATE GREEN"
