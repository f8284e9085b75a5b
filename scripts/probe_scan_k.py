"""One-off probe: does a larger scan_steps K push the train step below
the measured 0.8 ms/step (batch 12/14, v5e)? The (K, B, ...) batch stack
costs K*B*6.6 MB HBM, so K is bounded at large B — this probes the
frontier configs before promoting any into bench.py CONFIGS.

Usage: python scripts/probe_scan_k.py [B K]...   (defaults below)
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import bench

    pairs = [
        (int(a), int(b)) for a, b in zip(sys.argv[1::2], sys.argv[2::2])
    ] or [(12, 8), (14, 6), (14, 8)]
    for b, k in pairs:
        try:
            r = bench._measure(b, False, k)
            f = b * bench.T_OUT
            print(
                f"B={b} K={k}: train {r['train_step_s']*1e3:.2f} ms/step "
                f"({f/r['train_step_s']:.0f} f/s) rollout {r['rollout_step_s']*1e3:.2f} ms "
                f"combined {2*f/(r['train_step_s']+r['rollout_step_s']):.0f} f/s",
                flush=True,
            )
        except Exception as e:
            print(f"B={b} K={k}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
