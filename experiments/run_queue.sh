#!/bin/bash
# Serial hardware measurement queue (relay returned 2026-08-19 ~02:20).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/root/repo/experiments/out
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ==="
}
run bench python bench.py
run r9_lowlat_batchgrid python experiments/exp_r9_lowlat_batchgrid.py
run r11_lowlat_int8 python experiments/exp_r11_lowlat_int8.py
run r8_lowlat_e2e python experiments/exp_r8_lowlat_e2e.py
run r8_model_latency python experiments/exp_r8_model_latency.py
run r10_artifact python experiments/exp_r10_artifact.py
run r8_trainsplit python experiments/exp_r8_trainsplit.py
run r3_online_mixed python experiments/exp_r3_online_mixed.py
run cli_trainstep_erf python -m vit_spoof_detection_pda_tpu benchmark --train-step
run cli_trainstep_tanh python -m vit_spoof_detection_pda_tpu benchmark --train-step --set model.gelu=tanh
echo "QUEUE DONE $(date -u +%H:%M:%S)"
