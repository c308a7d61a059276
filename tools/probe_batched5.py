"""TPU probe: isolate the vmapped-solve iteration divergence.

probe_batched4 measured the transition QP at 12075 iterations for batch
element 0 under vmap(B=4) vs 3200 for the SAME instance solved serially.
Two candidate mechanisms:
  (a) batched-einsum numerics: vmap changes the reduction layout of the
      G-sweeps, perturbing f32 results enough to flip the branch-sensitive
      transition QP onto a slow rho path;
  (b) cross-element lockstep: frozen elements / shared epoch boundaries
      change WHEN each element's checks and rho updates occur.
Discriminator: vmap over a SINGLETON batch (B=1). If counts blow up at
B=1, it's (a); if B=1 matches serial and B=2 diverges, it's (b).

Usage: python tools/probe_batched5.py [M]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    import bench

    opt = bench.make(15, "admm", 1e-4, 20000)
    omegas = opt.sample(jax.random.PRNGKey(0), M=M)
    a = jnp.asarray(0.2, jnp.float32)

    def stack(oms):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *oms)

    def perturbed(i):
        return jax.tree.map(lambda x: x * (1.0 + 1e-7 * (i + 1)), omegas)

    r1 = jax.jit(lambda om: opt.solve(om, a))(perturbed(0))
    print(f"PROBE_B5 serial   iters={np.asarray(r1.qp_iters).tolist()}",
          flush=True)

    for B in (1, 2):
        omb = stack([perturbed(i) for i in range(B)])
        res = jax.jit(jax.vmap(lambda om: opt.solve(om, a)))(omb)
        print(
            f"PROBE_B5 vmap B={B} "
            f"iters={np.asarray(res.qp_iters).tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
