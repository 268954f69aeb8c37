"""Re-measure the BENCH_DETAIL rows that moved with the r4 kernel tiers.

SUPERSEDED for routine use by `python bench.py --refresh-all` (r5): that
path re-measures EVERY row, merges (preserving provenance notes), prints an
old-vs-new drift diff, regenerates README.md's perf table, and exits 1 on
>10% drift. This script remains as the cheap two-row variant (turb_1024 +
dns_512x2048 only) with the same merge/diff semantics.

Run on the TPU:  nohup python runs/refresh_rows_r4.py > runs/refresh_rows_r4.log 2>&1 &
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    # build the namespace from bench.py's own parser so CLI defaults cannot
    # desync (r4 advisor finding #3)
    args = bench.make_parser().parse_args(["--n", "1024", "--workload", "all"])

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

    # merge (not replace): hand-added provenance keys survive re-runs
    # (r4 advisor finding #1); the drift print covers finding #2's README
    # reminder — or run bench.py --refresh-all to regenerate the table
    drift = bench._merge_row(detail, "turb_1024",
                             bench.workload_turbulence(args))
    json.dump(detail, open("BENCH_DETAIL.json", "w"), indent=1)

    drift += bench._merge_row(detail, "dns_512x2048",
                              bench.workload_dns(args, (512, 2048)))
    json.dump(detail, open("BENCH_DETAIL.json", "w"), indent=1)
    bad = bench._print_drift(drift)
    if bad:
        print(
            "[refresh] rows drifted >10% — regenerate the README table "
            "(bench.py --refresh-all) or update it by hand", file=sys.stderr,
        )
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
