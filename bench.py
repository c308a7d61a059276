"""Benchmark: drone_risk SAA SCP at M=1000 samples, full horizon, on TPU.

Default mode prints ONE JSON line: {"metric", "value", "unit",
"vs_baseline", ...extras}.

metric: full SCP solves per second (one solve = 15 SCP iterations of
linearize + CVaR-pack + QP solve at M=1000, the BASELINE.md north-star
configuration; the reference runs the same loop as JAX-CPU-x64 define + OSQP
solve per iteration, car/driving.py:486-513).

vs_baseline: speedup of the TPU run over the SAME jitted computation executed
on this host's CPU backend (f32). This is a conservative stand-in for the
reference CPU harness — the reference's per-iteration host<->OSQP round trip
and scipy.sparse rebuild of a ~61k-row matrix at M=1000 is strictly slower
than our fused CPU path, so the true speedup vs the reference is higher.

Honesty extras in the JSON line: qp_iters (per-SCP-iteration ADMM iteration
counts — none may sit at the max_iter cap), qp_solved (every QP certified at
its tolerance), l2_final (SCP step change; the f32 SCP has a ~3-6e-3 noise
floor through the degenerate post-gating QPs — the 1e-3 golden-trajectory
north star is asserted on the x64 path in CI, tests/test_reference_parity.py),
out-of-sample Monte-Carlo quality (safe fraction / AVaR / cost, next to the
x64 golden trajectory's own numbers on the same fresh samples), and a
parity_mode sub-object: the golden-branch certified configuration
(eps_rel 1e-5 + compensated iterative refinement; l2_vs_golden ~5.6e-2 with
MC cost equal to the golden's within 0.2%).

Scaling mode (--devices N [--platform cpu]): strong-scaling table of the
SAME M=1000 solve sharded over 1..N mesh devices (BASELINE.md solves/s at
1 chip / 1 host / N hosts; on a 1-chip host the table runs on the virtual
CPU mesh to validate the harness + collectives — perf numbers remain the
1-chip default mode). Efficiency = t_1 / (N * t_N).

Env knobs: BENCH_M, BENCH_ITERS, BENCH_REPEATS, BENCH_BACKEND
(admm | admm-ds | _admm-pallas | _admm-pallas-f | hybrid | ipm), BENCH_EPS,
BENCH_MAX_ITER, BENCH_KKT_REFINE, BENCH_KKT_REFINE_MODE (true | factored),
BENCH_SWEEP_PRECISION (highest | high), BENCH_RHO_EPOCH (0 = event-driven
rho epochs; the batched leg defaults to 100 via BENCH_RHO_EPOCH_BATCH),
BENCH_POLISH, BENCH_EPS_REL, BENCH_BATCH, BENCH_PARITY.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to bf16 MXU passes; the trajectory-optimization
# kernels are accuracy-sensitive (the ADMM convergence rate tracks KKT solve
# precision), so pin full-f32 arithmetic
jax.config.update("jax_default_matmul_precision", "highest")


def make(num_iters, backend, eps, max_iter, eps_rel=None, ir_cfg=None,
         polish=None, refine_mode=None, rho_ws=None, kkt_inv=None):
    from riskaversetrajopt_tpu.core.config import (
        DroneScenario,
        SCPConfig,
        SolverConfig,
    )
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from riskaversetrajopt_tpu.scp.driver import SAATrajOpt

    model = DroneModel(DroneScenario())
    return SAATrajOpt(
        model,
        method="saa",
        scp_cfg=SCPConfig(
            num_iters=num_iters,
            gate_iters=2,
            gate_row_scale=1e-7,
            gate_bound_l=-0.1,
            gate_bound_u=0.1,
        ),
        qp_backend=backend,
        admm_cfg=SolverConfig(
            eps_abs=eps,
            eps_rel=float(
                os.environ.get("BENCH_EPS_REL", eps if eps_rel is None
                               else eps_rel)
            ),
            max_iter=max_iter,
            polish=(
                bool(int(os.environ.get("BENCH_POLISH", "1")))
                if polish is None else polish
            ),
            kkt_refine_iters=int(os.environ.get("BENCH_KKT_REFINE", "1")),
            # "factored" + compensated factor formation: 2 G-sweeps/iter
            # instead of 4 — the iteration is HBM-bound, so this halves
            # per-iteration cost; measured 0.40s vs 0.70s per solve at
            # M=1000 with every QP certified (PARITY.md round 3)
            kkt_refine_mode=(
                os.environ.get("BENCH_KKT_REFINE_MODE", "factored")
                if refine_mode is None else refine_mode
            ),
            sweep_precision=os.environ.get("BENCH_SWEEP_PRECISION", "highest"),
            # fixed-cadence rho epochs — required for vmapped (batched)
            # solves; see SolverConfig.rho_epoch_every
            rho_epoch_every=int(os.environ.get("BENCH_RHO_EPOCH", "0")),
            # 1.5: eager rho tracking — refactorization is ~0.07 ms on the
            # structured Schur KKT (vs OSQP's sparse-LDL^T-justified 5);
            # hardware sweep at M=1000: 5/3/2/1.5 -> 13900/11975/10525/9575
            # canonical ADMM iterations (1.2 destabilizes: 16700)
            rho_update_factor=float(
                os.environ.get("BENCH_RHO_UPDATE_FACTOR", "1.5")
            ),
            # speed mode opts into cross-QP rho warm starts (gate-aware;
            # scp/driver._warm_rho) — library default is off for golden
            # branch-tracking parity
            rho_warm_start=(
                bool(int(os.environ.get("BENCH_RHO_WS", "1")))
                if rho_ws is None else rho_ws
            ),
            # inexact-SCP tolerance schedule (SolverConfig.eps_sched_iters):
            # QPs before this SCP iteration terminate at factor * eps.
            # admm-only (the driver rejects it on other backends, which
            # would silently ignore the traced eps multiplier)
            eps_sched_iters=(
                int(os.environ.get("BENCH_EPS_SCHED_ITERS", "0"))
                if backend == "admm" else 0
            ),
            eps_sched_factor=float(
                os.environ.get("BENCH_EPS_SCHED_FACTOR", "1.0")
            ),
            # per-iteration Schur solve through the precomputed explicit
            # inverse (MXU matvec) instead of 4 sequential triangular
            # solves (SolverConfig.kkt_chol_inverse). Speed-mode default ON:
            # hardware A/B at M=1000 measured 0.265 vs 0.290 s/solve at
            # identical iteration counts with MC quality inside the branch-
            # variance band (cost 0.506 vs 0.498, golden 0.476).
            kkt_chol_inverse=(
                bool(int(os.environ.get("BENCH_KKT_INV", "1")))
                if kkt_inv is None else kkt_inv
            ),
        ),
        ir_cfg=ir_cfg,
        dtype=jnp.float32,
    )


def _perturb(omegas, eps=None):
    """Tiny multiplicative input perturbation with a CRYPTOGRAPHICALLY
    RANDOM factor (~1e-7 relative): the accelerator runtime result-caches
    executions (observed across processes: the identical solve measured
    1.42 s on first run and 0.0002 s re-run later the same day, correct
    values included), so every timed instance must be one the runtime has
    never seen."""
    import secrets

    if eps is None:
        eps = (1.0 + secrets.randbelow(10**9) / 1e9) * 1e-7
    return jax.tree.map(lambda x: x * (1.0 + eps), omegas)


def time_solve(opt, omegas, alpha, device, repeats, eps_list=None,
               want_result=True):
    """Median solve time over `repeats` never-seen (randomly perturbed)
    problem instances, with the result MATERIALIZED TO HOST inside the
    timed region (async-dispatch cannot fake completion). The returned
    result object is the canonical (unperturbed) solve, excluded from
    timing. Pass the same `eps_list` to compare devices on identical
    instances (per-instance difficulty varies)."""
    import numpy as _np

    if eps_list is None:
        eps_list = [None] * repeats
    with jax.default_device(device):
        om = jax.tree.map(lambda x: jax.device_put(x, device), omegas)
        a = jax.device_put(jnp.asarray(alpha, jnp.float32), device)
        # warm-up / compile on a perturbed instance
        res = opt.solve(_perturb(om), a)
        _np.asarray(res.us)
        times = []
        for eps in eps_list[:repeats]:
            om_i = _perturb(om, eps)
            t0 = time.perf_counter()
            r = opt.solve(om_i, a)
            _np.asarray(r.us)
            times.append(time.perf_counter() - t0)
        times.sort()
        if want_result:
            # canonical instance for the reported metrics (golden
            # comparison, qp_iters) — not timed, possibly runtime-cached
            res = opt.solve(om, a)
            _np.asarray(res.us)
    return times[len(times) // 2], res


def batched_throughput(opt, omegas, alpha, B, repeats):
    """Throughput of B independent M=1000 solves vmapped in lockstep.

    The single-solve path is latency-bound on the TPU (62-dim triangular
    solves, scalar reductions, while-loop step latency); vmapping B problem
    instances (the batched-problem axis, SURVEY.md 2.3 — the reference
    solves its 30-repeat sweeps serially, drone_risk.py:498-503) turns those
    into (B, .)-batched ops at nearly the same latency. Under vmap the
    while_loop runs to the max iteration count over the batch and lax.cond
    branches both execute — the reported number pays those costs honestly.

    Returns (batched solves/s, median batch wall time)."""
    import numpy as _np

    def stack(oms):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *oms)

    a = jnp.asarray(alpha, jnp.float32)
    solve_b = jax.jit(jax.vmap(lambda om: opt.solve(om, a)))

    def batch():
        return stack([_perturb(omegas) for _ in range(B)])

    res = solve_b(batch())  # compile + warm
    _np.asarray(res.us)
    times = []
    for _ in range(repeats):
        omb = batch()
        t0 = time.perf_counter()
        r = solve_b(omb)
        _np.asarray(r.us)
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]
    return B / t, t


def scan_throughput(opt, omegas, alpha, B, repeats):
    """Aggregate throughput of B independent flagship-size instances via the
    on-device serial scheduler (`driver.solve_many`: one jitted `lax.scan`
    over instances). At M=1000 the ADMM iteration is HBM-bandwidth-bound, so
    lockstep vmap cannot beat serial — the scan scheduler instead runs each
    instance at its own convergence schedule with zero per-instance dispatch,
    targeting >= serial aggregate throughput for the reference's repeat
    sweeps at the flagship size (drone_risk.py:498-503).

    Returns (aggregate solves/s, median batch wall time)."""
    import numpy as _np

    def batch():
        oms = [_perturb(omegas) for _ in range(B)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *oms)

    alphas = jnp.full((B,), alpha, jnp.float32)
    res = opt.solve_many(batch(), alphas)  # compile + warm
    _np.asarray(res.us)
    times = []
    for _ in range(repeats):
        omb = batch()
        t0 = time.perf_counter()
        r = opt.solve_many(omb, alphas)
        _np.asarray(r.us)
        times.append(time.perf_counter() - t0)
    times.sort()
    t = times[len(times) // 2]
    return B / t, t



def _run_child(cmd, env, timeout=2400, attempts=2, backoff=120):
    """Run a bench child subprocess, retrying once on failure (transient
    tunnel/backend errors: a child gets no in-process re-exec retries)."""
    import subprocess

    last = None
    for i in range(attempts):
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout,
                env=env,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                parsed = json.loads(line[-1])
                if "error" not in parsed:
                    return parsed
                last = parsed
            else:
                last = {"error": (out.stderr or "no output")[-300:]}
        except Exception as e:  # noqa: BLE001 — bench must still report
            last = {"error": str(e)[:300]}
        if i + 1 < attempts:
            print(f"[bench] child {cmd[-1]} failed ({last}); retry in "
                  f"{backoff}s", file=sys.stderr, flush=True)
            time.sleep(backoff)
    return last


def hopper_bench(repeats):
    """Hopper NLP leg: the IPOPT-replacement engine (ops/nlp_ipm.py) on
    hardware — damped cold baseline + warm-started SAA solves in true f32
    (kkt_ruiz_iters=3), at the reference M=30 (hopper/hopper.py:44-56) AND
    a scaled M (the slip-CVaR rows are the sample-parallel axis), with
    out-of-sample MC safety (hopper/hopper.py:898-1008) and a same-host
    CPU reference time on identical instances."""
    import numpy as _np

    from riskaversetrajopt_tpu.core.config import HopperScenario
    from riskaversetrajopt_tpu.models.hopper import HopperModel
    from riskaversetrajopt_tpu.ops.cvar import avar
    from riskaversetrajopt_tpu.ops.nlp_ipm import (
        NLPConfig,
        classify_rows,
        solve_nlp,
    )

    model = HopperModel(HopperScenario())
    accel = jax.devices()[0]
    out = {}

    def timed(fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        return time.perf_counter() - t0, r

    def perturb_params(params, eps):
        return jax.tree.map(lambda x: x * (1.0 + eps), params)

    # ---- damped cold baseline (f32 certifies the x64 basin: PARITY.md
    # round 4 — damp 50/0.1 + ruiz 3 -> jump 1.0535 in ~60 iters) ----
    field_b = model.sample_friction(jax.random.PRNGKey(1), model.M,
                                    "baseline")
    fp, gp, params_b, gL, gU, n_eq, xL, xU = model.make_nlp_params(
        field_b, "baseline", 0.1
    )
    row_perm = classify_rows(gL, gU, n_eq)
    cfg_b = NLPConfig(tol=1e-4, max_iter=300, kkt_ruiz_iters=3,
                      damp_iters=50, damp_max=0.1)
    Z0 = model.initial_guess(model.M, jnp.float32)
    solve_b = jax.jit(lambda Z, p: solve_nlp(
        fp, gp, gL, gU, n_eq, xL, xU, Z, cfg_b, params=p, row_perm=row_perm
    ))
    solve_b(Z0, perturb_params(params_b, 3.1e-7))  # compile
    # timed on a never-seen instance (runtime result cache, see _perturb)
    t_b, res_b = timed(solve_b, Z0, perturb_params(params_b, 1.7e-7))
    res_b = solve_b(Z0, params_b)  # canonical for the warm start
    xs_b, us_b, *_ = model.split_z(res_b.Z)
    out["baseline"] = {
        "seconds": round(t_b, 4),
        "iters": int(res_b.iters),
        "solved": bool(res_b.solved),
        "jump": round(float(xs_b[-1, 0]), 4),
    }

    # ---- warm-started SAA legs at reference and scaled M ----
    alpha = float(os.environ.get("BENCH_HOPPER_ALPHA", "0.3"))
    scaled_M = int(os.environ.get("BENCH_HOPPER_SCALED_M", "300"))
    s = model.scn
    for M in (model.M, scaled_M):
        field = model.sample_friction(jax.random.PRNGKey(2), M, "saa")
        fp, gp, params, gL, gU, n_eq, xL, xU = model.make_nlp_params(
            field, "saa", alpha
        )
        row_perm = classify_rows(gL, gU, n_eq)
        cfg = NLPConfig(tol=1e-3, max_iter=500, kkt_ruiz_iters=3)
        n_xs = (s.S + 1) * s.n_x
        n_us = s.S * s.n_u
        Z0 = jnp.zeros(n_xs + n_us + M + 2, jnp.float32)
        Z0 = Z0.at[:n_xs].set(jnp.asarray(xs_b, jnp.float32).reshape(-1))
        Z0 = Z0.at[n_xs:n_xs + n_us].set(
            jnp.asarray(us_b, jnp.float32).reshape(-1)
        )
        solve_s = jax.jit(lambda Z, p: solve_nlp(
            fp, gp, gL, gU, n_eq, xL, xU, Z, cfg, params=p,
            row_perm=row_perm
        ))
        solve_s(Z0, perturb_params(params, 4.2e-7))  # compile
        times = []
        for i in range(repeats):
            t_i, _ = timed(solve_s, Z0, perturb_params(params,
                                                       (2.0 + i) * 1e-7))
            times.append(t_i)
        times.sort()
        t_s = times[len(times) // 2]
        res_s = solve_s(Z0, params)  # canonical, for quality metrics
        xs_s, us_s, *_ = model.split_z(res_s.Z)

        # out-of-sample MC safety on fresh friction fields
        # (hopper/hopper.py:898-1008 semantics as in experiments/hopper.py)
        mc_M = int(os.environ.get("BENCH_HOPPER_MC_M", "10000"))
        mc_field = model.sample_friction(jax.random.PRNGKey(99), mc_M, "saa")
        ee = jax.vmap(model.end_effector_position)(xs_s)
        px = ee[model.contact_x_idx, 0]
        forces = us_s[model.contact_u_idx, 2:]

        def verify(i, th, ta):
            mu = model.scn.mu_nom + jnp.sum(
                i[None, :] * jnp.cos(th[None, :] * px[:, None] + ta[None, :]),
                axis=1,
            )
            cons = forces[:, 0] - mu * forces[:, 1]
            mx = jnp.max(cons)
            return mx <= 1e-6, mx

        ok, mx = jax.vmap(verify)(
            mc_field.intensities, mc_field.thetas, mc_field.taus
        )

        # same jitted computation on the host CPU, identical instance
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            p_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), params)
            Z0_cpu = jax.device_put(Z0, cpu)
            solve_cpu = jax.jit(lambda Z, p: solve_nlp(
                fp, gp, gL, gU, n_eq, xL, xU, Z, cfg, params=p,
                row_perm=row_perm
            ))
            solve_cpu(Z0_cpu, perturb_params(p_cpu, 4.2e-7))  # compile
            t_cpu, _ = timed(solve_cpu, Z0_cpu,
                             perturb_params(p_cpu, 2.0e-7))

        out[f"saa_M{M}"] = {
            "solves_per_s": round(1.0 / t_s, 4),
            "seconds": round(t_s, 4),
            "iters": int(res_s.iters),
            "solved": bool(res_s.solved),
            "jump": round(float(xs_s[-1, 0]), 4),
            "mc_safe": round(float(jnp.mean(ok)), 4),
            "mc_avar": round(float(avar(mx, alpha)), 5),
            "alpha": alpha,
            "cpu_seconds": round(t_cpu, 4),
            "vs_cpu": round(t_cpu / t_s, 2),
        }
        print(f"[bench-hopper] M={M} {out[f'saa_M{M}']}", file=sys.stderr)
    return out


def scaling_mode(opt, M, iters, repeats, max_devices):
    """Strong-scaling table over 1..max_devices mesh devices."""
    from riskaversetrajopt_tpu.parallel.mesh import make_mesh, shard_samples

    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    rows = []
    # BENCH_SCALING_COUNTS: comma-separated device counts to run in THIS
    # process. On a small host, run one count per process with
    # xla_force_host_platform_device_count equal to that count (see
    # tools/make_scaling.py): with a fixed 8-device split the XLA:CPU
    # threadpool slices make the 1-device leg run on 1/8 of the host and
    # the table reads super-linear.
    env_counts = os.environ.get("BENCH_SCALING_COUNTS", "")
    if env_counts:
        counts = [int(c) for c in env_counts.split(",")]
    else:
        n = 1
        counts = []
        while n <= max_devices:
            counts.append(n)
            n *= 2
        if counts[-1] != max_devices:
            counts.append(max_devices)
    for n in counts:
        import numpy as _np

        # n == 1: the plain unsharded single-device path — what a 1-chip
        # user runs, and the honest t_1. (A degenerate 1-device mesh runs
        # the GSPMD-partitioned program, which on XLA:CPU is ~10-20x slower
        # than the unpartitioned one — measured 187 s vs ~20 s at M=1000 —
        # and would make the table read super-linear.)
        mesh = make_mesh(n_sample_devices=n) if n > 1 else None

        def place(tree):
            if mesh is None:
                return jax.tree.map(
                    lambda x: jax.device_put(x, jax.devices()[0]), tree
                )
            return shard_samples(tree, mesh)

        # alpha=0.2: the golden-characterized instance (see main-mode
        # comment). Iteration counts are reported per leg because sharding
        # changes reduction order -> a different f32 ADMM branch -> possibly
        # very different iteration counts on the branch-sensitive
        # transition QP; times are only comparable per-iteration.
        a = jnp.asarray(0.2, opt.dtype)
        res = opt.solve(
            place(_perturb(omegas)), a
        )  # compile + warm (perturbed: see _perturb on the result cache)
        _np.asarray(res.us)
        # (t, iters) recorded PER INSTANCE and selected as a pair: the
        # perturbed instances' iteration counts are branch-sensitive (up
        # to ~3x spread), so pairing the median time with another
        # instance's count would corrupt us-per-iteration
        pairs = []
        for _ in range(repeats):
            om = place(_perturb(omegas))
            t0 = time.perf_counter()
            res = opt.solve(om, a)
            _np.asarray(res.us)
            pairs.append(
                (time.perf_counter() - t0, int(sum(res.qp_iters.tolist())))
            )
        pairs.sort()
        t, total_iters = pairs[len(pairs) // 2]
        rows.append((n, t, total_iters))
        print(f"[bench-scaling] devices={n} t={t:.4f}s "
              f"solves/s={1.0/t:.4f} total_qp_iters={total_iters}",
              file=sys.stderr)
    # Efficiency/speedup are only meaningful against a 1-device baseline;
    # with BENCH_SCALING_COUNTS not starting at 1, report null rather than
    # a number silently keyed to whatever count ran first (ADVICE r4).
    n0, t1 = rows[0][0], rows[0][1]
    tN = rows[-1][1]
    N = rows[-1][0]
    have_base = n0 == 1
    eff = t1 / (N * tN) if have_base else None
    print(
        json.dumps(
            {
                "metric": f"drone_risk SCP strong-scaling efficiency "
                          f"(M={M}, {iters} iters, {n0}->{N} devices)",
                "value": round(eff, 4) if have_base else None,
                "unit": "efficiency",
                "vs_baseline": round(t1 / tN, 3) if have_base else None,
                "table": [
                    {"devices": n, "seconds": round(t, 4),
                     "total_qp_iters": it} for n, t, it in rows
                ],
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="scaling mode: strong-scaling table over 1..N devices")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for the virtual mesh)")
    ap.add_argument("--batched-child", type=int, default=0,
                    help=argparse.SUPPRESS)  # internal: batched-throughput leg
    ap.add_argument("--hopper-child", action="store_true",
                    help=argparse.SUPPRESS)  # internal: hopper NLP leg
    ap.add_argument("--ds-child", action="store_true",
                    help=argparse.SUPPRESS)  # internal: ds parity leg
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.devices and args.platform == "cpu":
        # virtual mesh: must be set before the CPU backend initializes
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    M = int(os.environ.get("BENCH_M", "1000"))
    iters = int(os.environ.get("BENCH_ITERS", "15"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    backend = os.environ.get("BENCH_BACKEND", "admm")
    # Speed mode (the headline): warm-started structured ADMM + polish at
    # eps (1e-4, 1e-4) — every QP certified `solved` at a dual tolerance
    # 10x TIGHTER than the reference's own OSQP setting (OSQP_TOL=1e-3
    # gives eps_rel*||q||_inf ~ 10; ours is 1.0). Measured M=1000:
    # 15/15 solved, MC safety above target, control cost within ~13% of
    # the x64 golden trajectory's.
    eps = float(os.environ.get("BENCH_EPS", "1e-4"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "20000"))

    opt = make(iters, backend, eps, max_iter)

    if args.devices:
        scaling_mode(opt, M, iters, repeats, args.devices)
        return

    if args.batched_child:
        # Batched-problem axis at the REFERENCE's sweep shape: 30 repeats x
        # M=50 (drone_risk.py:55-56,498-503, solved serially there). At
        # M=1000 the ADMM iteration is HBM-bandwidth-bound (4 sweeps x
        # 15.1 MB at 819 GB/s), so lockstep-batching full-size problems
        # cannot beat serial; the batched axis pays off where latency
        # dominates — the reference's own small-M repeat sweeps.
        Mb = int(os.environ.get("BENCH_BATCH_M", "50"))
        omegas = opt.sample(jax.random.PRNGKey(0), M=Mb)
        bsps, t_b = batched_throughput(
            opt, omegas, 0.2, args.batched_child, max(1, repeats - 1)
        )
        # serial reference point on the same instance shape
        t_1, _ = time_solve(
            opt, omegas, 0.2, jax.devices()[0], max(1, repeats - 1),
            want_result=False,
        )
        out = {
            "batch": args.batched_child,
            "M": Mb,
            "solves_per_s": round(bsps, 4),
            "batch_seconds": round(t_b, 4),
            "serial_solve_s": round(t_1, 4),
            "speedup_vs_serial": round(bsps * t_1, 2),
        }
        # flagship-size leg: scan-over-instances scheduler at M (HBM-bound
        # regime where lockstep vmap loses; see scan_throughput)
        Bs = int(os.environ.get("BENCH_SCAN_B", "4"))
        if Bs > 1:
            om_f = opt.sample(jax.random.PRNGKey(0), M=M)
            ssps, t_s = scan_throughput(
                opt, om_f, 0.2, Bs, max(1, repeats - 1)
            )
            t_f, _ = time_solve(
                opt, om_f, 0.2, jax.devices()[0], max(1, repeats - 1),
                want_result=False,
            )
            out["scan_flagship"] = {
                "batch": Bs,
                "M": M,
                "solves_per_s": round(ssps, 4),
                "batch_seconds": round(t_s, 4),
                "serial_solve_s": round(t_f, 4),
                "speedup_vs_serial": round(ssps * t_f, 2),
            }
        print(json.dumps(out))
        return

    if args.hopper_child:
        print(json.dumps(hopper_bench(max(1, repeats - 1))))
        return

    if args.ds_child:
        # Double-single high-precision leg (ops/admm_ds.py): the on-chip
        # branch-tracking configuration — every QP certified at eps 1e-6
        # (below the plain-f32 stall floor) with ds iterates. Reported:
        # throughput, golden distance, certification, MC quality.
        ds_opt = make(iters, "admm-ds", 1e-6, 45000, eps_rel=1e-6,
                      polish=False, rho_ws=False, kkt_inv=False)
        omegas = ds_opt.sample(jax.random.PRNGKey(0), M=M)
        t_ds, res_ds = time_solve(
            ds_opt, omegas, 0.2, jax.devices()[0],
            int(os.environ.get("BENCH_DS_REPEATS", "1")),
        )
        import numpy as np

        out = {
            "solves_per_s": round(1.0 / t_ds, 4),
            "seconds": round(t_ds, 4),
            "qp_iters": res_ds.qp_iters.tolist(),
            "qp_uncertified": len(
                [v for v in res_ds.qp_solved.tolist() if not v]
            ),
        }
        gold_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures",
            f"gold_drone_m{M}_a0.2_seed0_iters15.npy",
        )
        if os.path.exists(gold_path):
            gold = np.load(gold_path)
            us_d = np.asarray(res_ds.us)
            out["l2_vs_golden"] = float(
                np.linalg.norm(us_d - gold) / np.linalg.norm(gold)
            )
        mc_om = ds_opt.sample(
            jax.random.PRNGKey(99),
            M=int(os.environ.get("BENCH_DS_MC_M", "10000")),
        )
        mc_d = ds_opt.monte_carlo(res_ds.us, mc_om, 0.2)
        out["mc_safe"] = round(float(mc_d["safe_frac"]), 4)
        out["mc_cost"] = round(float(mc_d["cost"]), 4)
        print(json.dumps(out))
        return

    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    # alpha=0.2 matches the committed reference golden fixture
    # (tests/fixtures/gold_drone_m1000_a0.2_seed0_iters15.npy) so the bench
    # can report the north-star trajectory error directly
    alpha = 0.2

    import secrets

    eps_list = [
        (1.0 + secrets.randbelow(10**9) / 1e9) * 1e-7 for _ in range(repeats)
    ]
    accel = jax.devices()[0]
    t_accel, res = time_solve(opt, omegas, alpha, accel, repeats, eps_list)
    l2_final = float(res.l2_errors[-1])

    l2_vs_golden = None
    gold_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures",
        f"gold_drone_m{M}_a{alpha}_seed0_iters{iters}.npy",
    )
    gold = None
    if os.path.exists(gold_path):
        import numpy as np

        gold = np.load(gold_path)
        us = np.asarray(res.us)
        l2_vs_golden = float(
            np.linalg.norm(us - gold) / np.linalg.norm(gold)
        )
    # Out-of-sample Monte-Carlo quality of the solved trajectory — the
    # reference's own validation criterion (drone_risk.py:643-762): safety
    # rate vs 1-alpha, AVaR of the max constraint, control cost. Reported
    # next to the golden trajectory's own stats on the SAME fresh samples
    # so solution quality is directly comparable even where f32/x64
    # solution-branch divergence makes raw l2_vs_golden macroscopic (the
    # degenerate post-gating QPs; see PARITY.md).
    # M=10000 fresh samples: the reference's own oracle size
    # (car/driving.py:621, drone_risk.py:647)
    mc_om = opt.sample(
        jax.random.PRNGKey(99), M=int(os.environ.get("BENCH_MC_M", "10000"))
    )
    mc = opt.monte_carlo(res.us, mc_om, alpha)
    mc_stats = {
        "mc_safe": round(float(mc["safe_frac"]), 4),
        "mc_avar": round(float(mc["avar"]), 4),
        "mc_cost": round(float(mc["cost"]), 4),
    }
    if gold is not None:
        mcg = opt.monte_carlo(jnp.asarray(gold, jnp.float32), mc_om, alpha)
        mc_stats.update({
            "mc_safe_golden": round(float(mcg["safe_frac"]), 4),
            "mc_avar_golden": round(float(mcg["avar"]), 4),
            "mc_cost_golden": round(float(mcg["cost"]), 4),
        })

    qp_iters = res.qp_iters.tolist()
    qp_solved = (
        res.qp_solved.tolist() if hasattr(res, "qp_solved") else None
    )
    capped = [i for i in qp_iters if i >= max_iter]
    print(
        f"[bench] device={accel} M={M} iters={iters} backend={backend} "
        f"eps={eps} t={t_accel:.4f}s l2_final={l2_final:.2e} "
        f"l2_vs_golden={l2_vs_golden} qp_iters={qp_iters} "
        f"capped={len(capped)}",
        file=sys.stderr,
    )

    # Parity mode (BENCH_PARITY=1, default): the golden-branch certified
    # configuration — base ADMM at eps (1e-4, 1e-5) follows the reference's
    # warm-started-OSQP solution branch (dual tolerance 100x tighter than
    # the reference's own), and compensated iterative-refinement rounds
    # (ops/qp_refine.py) certify the QPs the raw f32 iteration stalls on.
    # Measured M=1000: 15/15 certified, l2_vs_golden 5.6e-2, MC cost
    # 0.4764 vs the golden's 0.4756 on the same fresh samples.
    parity = None
    if int(os.environ.get("BENCH_PARITY", "1")) and gold is not None:
        from riskaversetrajopt_tpu.ops.qp_refine import IRConfig

        # pinned to the golden-branch-certified knobs: no cross-QP rho warm
        # start (the speed-mode defaults trade branch tracking for
        # throughput). Refine mode "factored" (compensated factor formation,
        # 2 G-sweeps/iter) was A/B'd against "true" on hardware (round 4):
        # 0.5718 vs 0.3141 solves/s with l2_vs_golden 0.0383 vs 0.0337 and
        # 0 uncertified QPs in both — branch-safe, so it is the default.
        p_opt = make(
            iters, "admm-ir", 1e-4, 20000, eps_rel=1e-5,
            ir_cfg=IRConfig(
                base_eps_abs=1e-4, base_eps_rel=1e-5, base_max_iter=20000
            ),
            polish=False,
            refine_mode=os.environ.get("BENCH_PARITY_REFINE_MODE", "factored"),
            rho_ws=False,
            # inverse Schur application promoted for parity too (round-4
            # honest A/B after wiring it through solve_saa_qp_ir — the
            # first A/B ran on a silent no-op): 0.6959 vs 0.4535 solves/s
            # median-of-3, l2_vs_golden 0.0349 vs 0.0383, 0 uncertified,
            # MC cost 0.4763 vs golden 0.4756
            kkt_inv=bool(int(os.environ.get("BENCH_PARITY_KKT_INV", "1"))),
        )
        # median of 3: the parity solve's base-iteration count is
        # branch-sensitive across perturbed instances (measured 1.75-2.21 s
        # on single-instance legs)
        t_par, res_par = time_solve(
            p_opt, omegas, alpha, accel,
            int(os.environ.get("BENCH_PARITY_REPEATS", "3")),
        )
        import numpy as np

        us_p = np.asarray(res_par.us)
        mc_p = p_opt.monte_carlo(res_par.us, mc_om, alpha)
        parity = {
            "solves_per_s": round(1.0 / t_par, 4),
            "l2_vs_golden": float(
                np.linalg.norm(us_p - gold) / np.linalg.norm(gold)
            ),
            "qp_solved_all": bool(all(res_par.qp_solved.tolist())),
            # count of QPs NOT certified at the tolerance (qp_iters includes
            # base + refinement-round iterations, so a raw >=cap test would
            # misread a certified-after-rescue QP as capped)
            "qp_uncertified": len(
                [s for s in res_par.qp_solved.tolist() if not s]
            ),
            "mc_safe": round(float(mc_p["safe_frac"]), 4),
            "mc_avar": round(float(mc_p["avar"]), 4),
            "mc_cost": round(float(mc_p["cost"]), 4),
        }
        print(f"[bench] parity mode t={t_par:.4f}s {parity}", file=sys.stderr)

    # Batched-throughput extra (BENCH_BATCH instances vmapped in lockstep;
    # the TPU-native answer to the reference's serial 30-repeat sweeps).
    # Run in a SUBPROCESS: a device fault at B x M cannot poison this
    # process (a wedged chip takes minutes to recover — see CLAUDE.md).
    batched = None
    B = int(os.environ.get("BENCH_BATCH", "30"))
    if B > 1:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--batched-child", str(B)]
        if args.platform:
            cmd += ["--platform", args.platform]
        env = dict(os.environ)
        # rho-epoch cadence for the batched child (0 = event-driven;
        # fixed cadence was measured NOT to fix the lockstep divergence
        # and to slow serial convergence — see PARITY.md round 3)
        env.setdefault(
            "BENCH_RHO_EPOCH",
            os.environ.get("BENCH_RHO_EPOCH_BATCH", "0"),
        )
        batched = _run_child(cmd, env)
        if batched is not None and "error" in batched:
            batched.setdefault("batch", B)
        print(f"[bench] batched throughput: {batched}", file=sys.stderr)

    # ds high-precision leg (subprocess-isolated)
    ds_leg = None
    if int(os.environ.get("BENCH_DS", "1")) and M == 1000:
        cmd = [sys.executable, os.path.abspath(__file__), "--ds-child"]
        if args.platform:
            cmd += ["--platform", args.platform]
        ds_leg = _run_child(cmd, dict(os.environ))
        print(f"[bench] ds leg: {ds_leg}", file=sys.stderr)

    # Hopper NLP leg (the IPOPT-replacement engine on hardware) — in a
    # subprocess like the batched leg so an NLP-side device fault cannot
    # poison the main record
    hopper = None
    if int(os.environ.get("BENCH_HOPPER", "1")):
        cmd = [sys.executable, os.path.abspath(__file__), "--hopper-child"]
        if args.platform:
            cmd += ["--platform", args.platform]
        hopper = _run_child(cmd, dict(os.environ))
        print(f"[bench] hopper leg: {hopper}", file=sys.stderr)

    cpu = jax.devices("cpu")[0]
    t_cpu, _ = time_solve(opt, omegas, alpha, cpu, 1, eps_list,
                          want_result=False)
    print(f"[bench] cpu baseline t={t_cpu:.4f}s", file=sys.stderr)

    solves_per_s = 1.0 / t_accel
    print(
        json.dumps(
            {
                "metric": f"drone_risk SCP solves/s (M={M}, {iters} iters, "
                          f"1 chip, {backend})",
                "value": round(solves_per_s, 4),
                "unit": "solves/s",
                "vs_baseline": round(t_cpu / t_accel, 2),
                "l2_final": l2_final,
                "l2_vs_golden": l2_vs_golden,
                "qp_iters": qp_iters,
                "qp_solved": qp_solved,
                "qp_capped": len(capped),
                **mc_stats,
                "parity_mode": parity,
                "ds_mode": ds_leg,
                "batched_throughput": batched,
                "hopper": hopper,
            }
        )
    )


def _main_with_retries():
    """Run main() under a bounded re-exec retry loop.

    A transient accelerator-backend failure (init UNAVAILABLE after a queue
    preemption, or a device fault mid-run — the chip recovers in ~2-4 min)
    must not lose the whole perf record: JAX caches a failed backend for the
    life of the process, so retry by RE-EXECING a fresh process after a
    backoff. On terminal failure still print a parseable JSON line with an
    "error" field before exiting nonzero."""
    import traceback

    try:
        main()
        return
    except Exception as e:  # noqa: BLE001 — bench must always emit JSON
        traceback.print_exc()
        attempt = int(os.environ.get("BENCH_ATTEMPT", "1"))
        max_attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
        # the batched child runs inside the parent's subprocess timeout and
        # its failure is already tolerated (reported in the "batched" field)
        # — don't burn retry backoffs there
        if any(f in sys.argv[1:] for f in
               ("--batched-child", "--hopper-child", "--ds-child")):
            max_attempts = 1
        if attempt < max_attempts:
            backoff = int(os.environ.get("BENCH_RETRY_BACKOFF_S", "120"))
            print(
                f"[bench] attempt {attempt}/{max_attempts} failed "
                f"({type(e).__name__}: {e}); re-exec in {backoff}s",
                file=sys.stderr, flush=True,
            )
            time.sleep(backoff)
            os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print(json.dumps({
            "metric": "drone_risk SCP solves/s (bench failed)",
            "value": None,
            "unit": "solves/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
            "attempts": attempt,
        }), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    _main_with_retries()
