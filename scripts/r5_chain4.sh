#!/bin/bash
# Round-5 TPU work queue, part 4: idle-chip measurements once all
# training/eval work has drained — the Finding 10 session-overhead
# decomposition, then the headline bench (validates the hardened
# bench.py end to end and warms every compile cache the driver's
# round-end capture will hit), then the full --all leg refresh.
cd /root/repo
set -x

step() { echo "=== $(date -u +%H:%M:%S) START $1 ==="; }

step wait_chain2
while kill -0 "$(cat /tmp/r5_chain2.pid)" 2>/dev/null; do sleep 60; done

step session_overhead
timeout 1800 python scripts/session_overhead.py > /tmp/r5_probe.log 2>&1 || true

step bench_headline
timeout 3600 python bench.py > /tmp/r5_bench_headline.log 2>&1 || true

step bench_all
timeout 9000 python bench.py --all > /tmp/r5_bench_all.log 2>&1 || true

echo "=== $(date -u +%H:%M:%S) CHAIN4 DONE ==="
