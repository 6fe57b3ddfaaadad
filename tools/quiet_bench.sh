#!/bin/bash
# Retry the bench until a run passes BOTH gates:
#   - its own window_quality == "ok" (endpoint canaries), and
#   - total < SANE_MAX seconds (mid-run contention sanity: the endpoint
#     canaries false-passed a loadavg-25 window on 2026-08-18, see
#     BENCH_DETAIL.r14-head2.json).
# Start gate: 1-min loadavg < 1.0 AND host steal-rate ~ 0 over 20 s.
# Watchdog: kill an attempt whose steal-rate spikes (host co-tenant burst).
cd /root/repo
SANE_MAX=${SANE_MAX:-80}
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in $(seq ${START:-3} 12); do
  while :; do
    la=$(cut -d' ' -f1 /proc/loadavg)
    s0=$(steal); sleep 20; s1=$(steal)
    rate=$(( (s1 - s0) / 20 ))   # jiffies/s of steal across all cpus
    ok=$(python3 -c "print(1 if $la < 1.0 and $rate < 5 else 0)")
    [ "$ok" = "1" ] && break
    sleep 25
  done
  echo "=== attempt $i starting, loadavg $(cat /proc/loadavg) stealrate=$rate"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench.py --label "r14-head$i" >/tmp/bench_r14_head$i.out 2>&1 &
  BPID=$!
  # watchdog: sample steal every 20 s while the bench runs.  Our own
  # 32-way load on this oversubscribed host shows ~100-200 j/s steal
  # (measured 2026-08-18: idle 77, 32 busy spinners 201); the windows
  # that ruined head1/head2 starve the canaries 7-10x, i.e. thousands.
  # Kill on TWO consecutive samples > 350 j/s (attempt 5 ran 362 s total
  # while steal sat at 350-540 for minutes; a clean busy run reads ~200).
  hot=0
  while kill -0 $BPID 2>/dev/null; do
    s0=$(steal); sleep 20; s1=$(steal)
    rate=$(( (s1 - s0) / 20 ))
    echo "    steal $rate j/s"
    if [ "$rate" -gt 350 ]; then
      hot=$((hot+1))
    else
      hot=0
    fi
    if [ "$hot" -ge 2 ]; then
      echo "=== attempt $i KILLED: sustained steal burst rate=$rate jiffies/s"
      kill $BPID 2>/dev/null; sleep 3; kill -9 $BPID 2>/dev/null
      break
    fi
  done
  wait $BPID 2>/dev/null
  q=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.r14-head$i.json'))['calibration']['window_quality'])" 2>/dev/null)
  v=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.r14-head$i.json'))['value'])" 2>/dev/null)
  echo "=== attempt $i done: value=$v window=$q"
  good=$(python3 -c "print(1 if '$q'=='ok' and '$v' and float('${v:-9999}') < $SANE_MAX else 0)")
  [ "$good" = "1" ] && { echo "=== ACCEPTED attempt $i"; exit 0; }
done
exit 1
