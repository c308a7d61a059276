"""TPU probe: full-SCP batched (vmapped opt.solve) diagnosis.

tools/probe_batched3.py cleared the QP loop: vmapped solve_saa_qp at B=4
amortizes 2.7-3.1x per lockstep iteration across every solver config. Yet
BENCH_r02's batched leg ran 4.4 s/solve vs 0.695 s serial. This probe vmaps
the WHOLE SCP solve (exactly what bench.batched_throughput does), times it
against the serial solve on the same instances, and prints per-element
qp_iters so the lockstep-executed iteration count (sum over SCP iters of
the max over the batch) can be compared to the serial count.

Usage: python tools/probe_batched4.py [M] [B] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    import bench

    opt = bench.make(iters, "admm", 1e-4, 20000)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    a = jnp.asarray(0.2, jnp.float32)

    def stack(oms):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *oms)

    def perturbed(i):
        return jax.tree.map(lambda x: x * (1.0 + 1e-7 * (i + 1)), omegas)

    omb = stack([perturbed(i) for i in range(B)])

    solve_b = jax.jit(jax.vmap(lambda om: opt.solve(om, a)))
    res = solve_b(omb)  # compile + warm
    np.asarray(res.us)
    t0 = time.perf_counter()
    res = solve_b(jax.tree.map(lambda x: x * (1.0 + 3e-8), omb))
    np.asarray(res.us)
    tb = time.perf_counter() - t0

    solve_1 = jax.jit(lambda om: opt.solve(om, a))
    r1 = solve_1(perturbed(0))
    np.asarray(r1.us)
    t0 = time.perf_counter()
    r1 = solve_1(jax.tree.map(lambda x: x * (1.0 + 3e-8), perturbed(0)))
    np.asarray(r1.us)
    t1 = time.perf_counter() - t0

    qb = np.asarray(res.qp_iters)  # (B, iters)
    lockstep = int(np.max(qb, axis=0).sum())
    print(
        f"PROBE_B4 {{'B': {B}, 't_batch': {tb:.4f}, 't_single': {t1:.4f}, "
        f"'per_solve': {tb / B:.4f}, 'ratio': {tb / t1:.2f}, "
        f"'lockstep_iters': {lockstep}, "
        f"'serial_iters': {int(np.asarray(r1.qp_iters).sum())}, "
        f"'qp_iters_b': {qb.tolist()}}}",
        flush=True,
    )


if __name__ == "__main__":
    main()
