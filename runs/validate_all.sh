#!/bin/bash
# One-shot TPU validation + A/B queue for the r3 gated kernels.
# Run with: nohup bash runs/validate_all.sh > runs/validate_all.log 2>&1 &
# Each stage appends to its own log; a stage failure does not stop later
# stages (lowering failures mean "leave that gate off", not "abort").
cd /root/repo
echo "=== start $(date)"
echo "--- stage 1: lowering checks"
timeout 3000 python runs/check_spectral_lowering.py > runs/lowering.log 2>&1
echo "lowering exit $? ($(date))"
tail -5 runs/lowering.log
echo "--- stage 2: 512^2 spectral A/B"
timeout 4000 python runs/ab_spectral.py > runs/ab_spectral.log 2>&1
echo "ab_spectral exit $? ($(date))"
tail -10 runs/ab_spectral.log
echo "--- stage 3: 128^3 kernel A/B"
timeout 5000 python runs/ab_3d_kernels.py > runs/ab_3d.log 2>&1
echo "ab_3d exit $? ($(date))"
tail -12 runs/ab_3d.log
echo "--- stage 4: masked-assembly A/B (cavity)"
timeout 4000 python runs/ab_advm.py > runs/ab_advm.log 2>&1
echo "ab_advm exit $? ($(date))"
tail -8 runs/ab_advm.log
echo "--- stage 5: plane-block jacobi A/B"
timeout 4000 python runs/ab_jac3d.py > runs/ab_jac3d.log 2>&1
echo "ab_jac3d exit $? ($(date))"
tail -8 runs/ab_jac3d.log
echo "--- stage 6: cavity phase roofline (default + fused gates)"
timeout 2500 python runs/roofline_cavity.py > runs/roofline_cavity_default.log 2>&1
echo "roofline_cavity default exit $?"
DIFFPISO_FUSED_ADVM=auto DIFFPISO_FUSED_FVM=auto timeout 2500 python runs/roofline_cavity.py > runs/roofline_cavity_fused.log 2>&1
echo "roofline_cavity fused exit $?"
tail -12 runs/roofline_cavity_default.log
tail -12 runs/roofline_cavity_fused.log
echo "--- stage 6b (r5): batch-fold lowering + preconditioner precision probes"
timeout 2500 python runs/check_jac2_fold_lowering.py > runs/check_jac2_fold_lowering.log 2>&1
echo "jac2_fold lowering exit $?"
tail -4 runs/check_jac2_fold_lowering.log
timeout 3000 python runs/check_mm_precision.py > runs/check_mm_precision.log 2>&1
echo "mm_precision exit $?"
tail -11 runs/check_mm_precision.log
echo "--- stage 7: refresh ALL BENCH_DETAIL rows at current defaults (merge + drift check + README regen)"
timeout 9000 python bench.py --refresh-all > runs/refresh_all.log 2>&1
echo "refresh-all exit $? ($(date); exit 1 = >10% drift, review runs/refresh_all.log)"
tail -15 runs/refresh_all.log
echo "=== done $(date)"
