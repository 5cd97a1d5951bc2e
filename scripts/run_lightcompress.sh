#!/bin/bash
# Multi-host launch wrapper — the jax.distributed analogue of the
# reference's scripts/run_llmc.sh (torchrun + c10d rendezvous).
#
# On a Cloud TPU pod slice, run this SAME script on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`);
# jax.distributed auto-discovers the coordinator from TPU metadata — no
# rendezvous port juggling.  For manual bring-up set LCTPU_COORDINATOR,
# LCTPU_NUM_PROCESSES, LCTPU_PROCESS_ID.
#
# Usage:
#   task_name=awq_w4a16 config=configs/methods/Awq/awq_w4a16.yml \
#     ./scripts/run_lightcompress.sh            # compression pipeline
#   MODE=serve MODEL=/path/to/ckpt DP=2 TP=4 \
#     ./scripts/run_lightcompress.sh            # serving replicas

set -u
repo=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$repo:${PYTHONPATH:-}

MODE=${MODE:-pipeline}
task_name=${task_name:-lightcompress_task}

if [ "$MODE" = "serve" ]; then
  : "${MODEL:?MODE=serve needs MODEL=/path/to/checkpoint}"
  nohup python -m lightcompress_tpu.launch \
    --serve "$MODEL" --dp "${DP:-1}" --tp "${TP:-1}" \
    --kv-bits "${KV_BITS:-8}" --max-slots "${MAX_SLOTS:-8}" \
    --max-len "${MAX_LEN:-1024}" --smoke \
    > "${task_name}.log" 2>&1 &
else
  : "${config:?pipeline mode needs config=/path/to/cfg.yml}"
  nohup python -m lightcompress_tpu.launch \
    --config "$config" \
    > "${task_name}.log" 2>&1 &
fi
echo "launched $MODE (log: ${task_name}.log, pid $!)"
