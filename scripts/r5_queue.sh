#!/bin/bash
# Round-5 chip-recovery measurement queue. The tunneled v5e backend wedges
# intermittently (metadata RPCs answer, compile/execute RPCs hang — see
# RESULTS.md round-5 outage log); this waits for a real execute to succeed,
# then burns the recovered chip time in strict priority order:
#   A1  428k both scenes, strips=4            (lever 1 alone, fwd+train)
#   A2  428k surround fwd-only, pack_colors   (lever 2 alone)
#   B   2.08M surround, strips=4+pack         (VERDICT r4 ask #2 headline)
#   C   1.03M both scenes incl. train         (ask #3: HEAD train @ 1.03M)
#   D   reference-regime 30k run              (ask #1; open-ended, runs last)
# Each step logs to logs_r5/<name>.log so a partial queue still yields
# committed measurement tables.
set -u
cd /root/repo
mkdir -p logs_r5
probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()" 2>/dev/null
}
echo "queue start $(date -u +%H:%M:%S)" >> logs_r5/queue.log
until probe; do
  echo "tpu still wedged $(date -u +%H:%M:%S)" >> logs_r5/queue.log
  sleep 45
done
echo "RECOVERED $(date -u +%H:%M:%S)" >> logs_r5/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  # a heavy compile can re-wedge the backend (suspected trigger of both
  # round-5 outages); re-probe before every step so one wedged step does
  # not burn every downstream timeout against a dead backend
  until probe; do
    echo "re-wedged before $name $(date -u +%H:%M:%S)" >> logs_r5/queue.log
    sleep 45
  done
  echo "== $name start $(date -u +%H:%M:%S)" >> logs_r5/queue.log
  timeout "$tmo" "$@" > "logs_r5/$name.log" 2>&1
  echo "== $name exit=$? $(date -u +%H:%M:%S)" >> logs_r5/queue.log
}

run a1_428k_strips4 900 python bench.py --blend_strips 4 --skip_extra_scale
run a2_428k_pack 600 python bench.py --pack_colors --skip_extra_scale \
    --scene surround --skip_train
run b_2080k_strips4_pack 1500 python bench.py --points 2080000 \
    --blend_strips 4 --pack_colors
run c_1030k_train 900 python bench.py --points 1030000
run d_reference_regime 100000 python scripts/quality_run.py \
    --reference_regime --out /tmp/qrun_ref
echo "queue done $(date -u +%H:%M:%S)" >> logs_r5/queue.log
