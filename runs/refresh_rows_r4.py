"""Re-measure the BENCH_DETAIL rows that moved with the r4 kernel tiers.

The turb_1024 and dns_512x2048 rows in BENCH_DETAIL.json were measured at the
r3 kernel configuration; r4 added the LARGE per-iteration phase tier
(DIFFPISO_FUSED_KRYLOV_LARGE, runs/ab_phase_large.log: turb1024 fwd +13%,
grad30 +6%) and the row-tiled corrector bridge (runs/ab_corr_tiled.log:
turb1024 +1.1% fwd / +1.7% grad30), both default-auto at exactly these
shapes.  This script re-runs the two workloads through bench.py's own
workload functions at the current defaults and patches the rows in place
(regime labels recomputed by the workload functions themselves).

Run on the TPU:  nohup python runs/refresh_rows_r4.py > runs/refresh_rows_r4.log 2>&1 &
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    args = argparse.Namespace(
        n=1024, n3d=None, tol=1e-6, p_tol=1e-8, quick=False, fwd_only=False,
        spinup=2000, batch=1, network_dtype=None, workload="all",
    )

    import os

    import jax

    cache_dir = os.environ.get(
        "DIFFPISO_JAX_CACHE", os.path.expanduser("~/.cache/diffpiso_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[refresh] devices: {jax.devices()}", file=sys.stderr)

    detail = json.load(open("BENCH_DETAIL.json"))

    t1024 = bench.workload_turbulence(args)
    print("turb_1024:", json.dumps(t1024), file=sys.stderr)
    detail["turb_1024"] = t1024
    json.dump(detail, open("BENCH_DETAIL.json", "w"), indent=1)

    dns = bench.workload_dns(args, (512, 2048))
    print("dns_512x2048:", json.dumps(dns), file=sys.stderr)
    detail["dns_512x2048"] = dns
    json.dump(detail, open("BENCH_DETAIL.json", "w"), indent=1)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
