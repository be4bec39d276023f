"""Headline benchmark: BASELINE.json config 1 — 10-chain NRPT on a
multivariate Gaussian target (DEO swaps, slice-sampler explorer).

Prints ONE JSON line: log-density evaluations per second per chip in the
steady-state round, with vs_baseline = speedup over a serial single-core
NumPy implementation of the reference's algorithm (Pigeons.jl publishes no
quantitative numbers — BASELINE.md — so the baseline is measured here, on
this host, with the same algorithm, coordinate-wise Neal slice sampling with
doubling/shrinking, counting every log-density call).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the heavy while-loop kernels compile once ever
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

DIM = 100
N_CHAINS = 10
N_ROUNDS = 4  # adaptation warmup rounds before the timed fixed-length round
MEASURE_SCANS = 32  # timed round length
N_REPLICATES = 1024  # independent ladders vmapped on-chip (BASELINE north star)


# ---------------------------------------------------------------------------
# serial NumPy baseline: reference-style per-coordinate slice sampler
# (mirrors src/explorers/SliceSampler.jl semantics; counts every lp call)
# ---------------------------------------------------------------------------


def _serial_baseline_evals_per_sec(budget_s: float = 3.0) -> float:
    rng = np.random.default_rng(0)
    w, p = 10.0, 20
    evals = 0

    betas = np.linspace(0.0, 1.0, N_CHAINS)
    precs = (1.0 - betas) * 1.0 + betas * 10.0
    xs = rng.normal(size=(N_CHAINS, DIM))

    def lp(v, prec):
        nonlocal evals
        evals += 1
        return -0.5 * prec * float(np.dot(v, v))

    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s:
        for ci in range(N_CHAINS):
            prec = precs[ci]
            x = xs[ci]
            cached = lp(x, prec)
            evals -= 1  # cached once per pass, like the reference
            for c in range(DIM):
                z = cached - rng.exponential()
                old = x[c]

                def lp_at(v):
                    xv = x.copy()
                    xv[c] = v
                    return lp(xv, prec)

                L = old - w * rng.uniform()
                R = L + w
                lp_L, lp_R = lp_at(L), lp_at(R)
                K = p
                while K > 0 and (z < lp_L or z < lp_R):
                    if rng.uniform() <= 0.5:
                        L -= R - L
                        lp_L = lp_at(L)
                    else:
                        R += R - L
                        lp_R = lp_at(R)
                    K -= 1
                # shrink
                Lb, Rb = L, R
                for _ in range(1024):
                    new = Lb + rng.uniform() * (Rb - Lb)
                    lp_new = lp_at(new)
                    if z < lp_new:
                        x[c] = new
                        cached = lp_new
                        break
                    if new < old:
                        Lb = new
                    else:
                        Rb = new
    wall = time.perf_counter() - t0
    return evals / wall


# ---------------------------------------------------------------------------
# TPU measurement
# ---------------------------------------------------------------------------


def _tpu_run():
    from pigeons_tpu import Inputs, PT, SliceSamplerPallas, toy_mvn_target

    pt = PT(
        Inputs(
            target=toy_mvn_target(DIM),
            n_chains=N_CHAINS,
            n_rounds=N_ROUNDS,
            n_replicates=N_REPLICATES,
            seed=1,
            explorer=SliceSamplerPallas(),
            show_report=False,
        )
    )
    # adaptation warmup at one fixed scan count (a single compile), then the
    # timed round — run at MEASURE_SCANS twice so the timing excludes compile
    while pt.round_idx < N_ROUNDS:
        pt.run_round(n_scans=4)
    pt.run_round(n_scans=MEASURE_SCANS)
    reduced = pt.run_round(n_scans=MEASURE_SCANS)
    report = pt.reports[-1]
    # exp_steps counts log-density evals inside the explorer (pooled across
    # replicates); add the per-scan path evals done by the runtime itself
    # (lp_before + swap partner, 2N per scan per ladder)
    explorer_evals = float(np.sum(reduced.exp_steps))
    runtime_evals = 2.0 * N_CHAINS * report.n_scans * N_REPLICATES
    total_evals = explorer_evals + runtime_evals
    return total_evals / report.wall_time_s, report, pt


def main() -> None:
    baseline = _serial_baseline_evals_per_sec()
    value, report, pt = _tpu_run()
    print(
        json.dumps(
            {
                "metric": "logdensity_evals_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "evals/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )
    # context lines on stderr (not part of the contract)
    print(
        f"# serial-numpy baseline {baseline:.0f} evals/s | steady-state round: "
        f"{report.n_scans} scans in {report.wall_time_s:.2f}s | "
        f"round trips {pt.n_round_trips} | barrier {pt.global_barrier:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
