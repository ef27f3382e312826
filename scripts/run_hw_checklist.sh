#!/usr/bin/env bash
# One-command hardware measurement checklist — run on a session with the TPU tunnel
# up. Each step is independently bounded and logs to ./hw_checklist/.
#
#   bash scripts/run_hw_checklist.sh
#
# Round-4 status: every step below has a committed result (hw_checklist/*_r4*);
# re-run after perf-relevant changes to refresh them.
# 1. remat mode comparison at reference scale (B=8). Round-4 answer: full remat
#    WINS (fa 517.3 vs 529.1 ms; fbft 182.4 vs 185.4) — _resolve_remat keeps its
#    full-remat over-threshold branch; flip it only if a re-run reverses the order.
# 2. full bench under the DRIVER-LIKE envelope (BENCH_TIMEOUT_S defaults to 1200
#    inside bench.py; the external bound is slightly larger so the in-process
#    watchdog, not SIGKILL, ends an overrun). Round-4 record:
#    hw_checklist/bench_r4_full_record.json (302 clips/s @ 52.5% MFU).
# 3. adversarial dynamics validation at full reference scale (8+12 @ 224^2,
#    reference LRs, recon-seeded fa). Round-4 log:
#    hw_checklist/validate_adversarial_reference_r4.log.
# 4. driver-gate rehearsal (bench + dryrun output contracts under a driver-like
#    external timeout) — the r3 rc=124 regression guard.
#
# NOTE (measured r4): the persistent compile cache is source-location sensitive.
# After the LAST edit to bench.py or __graft_entry__.py in a round, run this
# checklist (or at least steps 2 and 4) once so the driver's round-end runs hit
# a warm cache.
set -u
cd "$(dirname "$0")/.."
mkdir -p hw_checklist

echo "== 0. device probe (90s bound)"
if ! timeout 90 python -c "import jax; print(jax.devices())" > hw_checklist/probe.log 2>&1; then
  echo "tunnel DOWN (probe timed out) — aborting; see hw_checklist/probe.log"
  exit 1
fi
cat hw_checklist/probe.log

echo "== 0.5 pre-generate the full decode fixture set (one-time ~15-20 min encode;"
echo "       cached under .bench_videos/, instant when already present)"
timeout 2400 python -u scripts/gen_bench_videos.py 2>&1 | tail -3 \
  || echo "fixture pre-generation failed/timed out — bench will use reduced16"

echo "== 1. remat comparison (B=8, on/blocks, fa + fbft)"
timeout 3600 python -u scripts/bench_remat.py --batch 8 --modes on,blocks --fbft \
  2>&1 | tee hw_checklist/remat.log

echo "== 1.5 int8 quantized serving comparison (bf16 vs int8-fa vs int8-fa+ft +"
echo "       fidelity + per-model splits). Round-5 record: hw_checklist/bench_quant_r5.log"
echo "       (404.2 clips/s fa+ft int8 at cossim 0.99993 vs bf16)."
timeout 3000 python -u scripts/bench_quant.py 2>&1 | tee hw_checklist/bench_quant.log

echo "== 2. bench.py (driver-like envelope)"
timeout 1500 python bench.py 2> hw_checklist/bench.stderr.log \
  | tee hw_checklist/bench.json

echo "== 3. validate_adversarial --scale reference"
timeout 7200 python -u scripts/validate_adversarial.py --scale reference \
  2>&1 | tee hw_checklist/validate_adversarial.log

echo "== 4. driver-gate rehearsal (dryrun contract; bench already ran above)"
timeout 1300 python scripts/rehearse_driver_gates.py --gate dryrun --envelope 1200 \
  2>&1 | tee hw_checklist/rehearsal.log

echo "== done; logs in hw_checklist/"
