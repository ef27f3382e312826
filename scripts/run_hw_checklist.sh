#!/usr/bin/env bash
# One-command hardware measurement checklist (ROADMAP.md) — run on a session with
# the TPU tunnel up. Each step is independently bounded and logs to ./hw_checklist/.
#
#   bash scripts/run_hw_checklist.sh
#
# 1. remat mode comparison at reference scale (B=8): if 'blocks' wins, point
#    _resolve_remat's over-threshold branch at 'blocks' (stages/anonymization_training.py).
# 2. full bench (expects action_train_step_ms < 26.3 and adversarial_fbft_step_ms
#    < 95.9 from the train-mode s2d stem; records decode_fast rate).
# 3. adversarial dynamics validation at reference scale (re-run; the last attempt
#    died when the tunnel dropped mid-run).
set -u
cd "$(dirname "$0")/.."
mkdir -p hw_checklist

echo "== 0. device probe (90s bound)"
if ! timeout 90 python -c "import jax; print(jax.devices())" > hw_checklist/probe.log 2>&1; then
  echo "tunnel DOWN (probe timed out) — aborting; see hw_checklist/probe.log"
  exit 1
fi
cat hw_checklist/probe.log

echo "== 1. remat comparison (B=8, on/blocks, fa + fbft)"
timeout 3600 python scripts/bench_remat.py --batch 8 --modes on,blocks --fbft \
  2>&1 | tee hw_checklist/remat.log

echo "== 2. bench.py"
BENCH_INIT_TIMEOUT_S=300 timeout 4000 python bench.py 2> hw_checklist/bench.stderr.log \
  | tee hw_checklist/bench.json

echo "== 3. validate_adversarial --scale reference"
timeout 7200 python scripts/validate_adversarial.py --scale reference \
  2>&1 | tee hw_checklist/validate_adversarial.log

echo "== done; logs in hw_checklist/"
