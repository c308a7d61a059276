"""TPU probe: codegen variants for the fused-ADMM kernel's sweep-1
contraction (the A^T G-sweep), the measured bottleneck at M=1000.

ops/pallas/saa_admm.py STATUS: the batched (TM,1,Kp)@(TM,Kp,Np) dot_general
is the only form the toolchain was known to accept, at ~316us/iteration
(codegen-bound) — slower than the XLA path (38-90us). This probe times
sweep-1-only kernels with Gs VMEM-RESIDENT (33.5 MB at M=1000 fits the
100 MB scoped-vmem budget) across variants:

  dot   - current batched dot_general
  mr1   - multiply + single reduce over Kp into a (TM, Np) accumulator,
          one final TM-reduction per iteration (no double-reduce: that form
          crashed the remote tpu_compile_helper round-1; sweep 2 already
          uses multiply+single-reduce successfully)
  mr2   - multiply + reduce(Kp) + immediate reduce(TM) per tile

One variant per process: python tools/probe_c1.py <variant> [M] [TM] [iters]
Prints PROBE_C1 {variant, ok, us_per_iter}.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    variant = sys.argv[1]
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    TM = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    from riskaversetrajopt_tpu.ops.pallas import saa_admm as pk
    from tools.probe_pallas import build_problem

    st, _ = build_problem(M)
    d = pk.kernel_dims(st, TM)
    NT, Mp, Kp, Np = d.NT, d.Mp, d.Kp, 128
    print(f"[c1] dims NT={NT} TM={TM} Mp={Mp} Kp={Kp} iters={iters}",
          flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    Gs = jax.random.normal(k1, (NT, TM, Kp, Np), jnp.float32)
    w0 = jax.random.normal(k2, (Mp, Kp), jnp.float32)

    def kernel(gs_ref, w_ref, out_ref, canary1, canary2, gtile, sem):
        cp = pltpu.make_async_copy(gs_ref, gtile, sem)
        cp.start()
        cp.wait()

        def rows(t):
            return pl.ds(t * TM, TM)

        def sweep(scale):
            if variant == "dot":
                acc = jnp.zeros((1, Np), jnp.float32)
                for t in range(NT):
                    w_blk = w_ref[rows(t), :] * scale
                    prod = jax.lax.dot_general(
                        w_blk[:, None, :], gtile[t],
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + jnp.sum(
                        jnp.sum(prod, axis=1), axis=0, keepdims=True
                    )
                return acc
            if variant == "mr1":
                acc = jnp.zeros((TM, Np), jnp.float32)
                for t in range(NT):
                    w_blk = w_ref[rows(t), :] * scale
                    acc = acc + jnp.sum(gtile[t] * w_blk[:, :, None], axis=1)
                return jnp.sum(acc, axis=0, keepdims=True)
            if variant == "mr2":
                acc = jnp.zeros((1, Np), jnp.float32)
                for t in range(NT):
                    w_blk = w_ref[rows(t), :] * scale
                    s1 = jnp.sum(gtile[t] * w_blk[:, :, None], axis=1)
                    acc = acc + jnp.sum(s1, axis=0, keepdims=True)
                return acc
            raise ValueError(variant)

        def iter_step(i, carry):
            # tiny data dependency chains the iterations together
            scale = 1.0 + carry * 1e-30
            acc = sweep(scale)
            return acc[0, 0]

        final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
        out_ref[...] = sweep(1.0 + final * 1e-30)
        canary1[...] = jnp.zeros((1, Np), jnp.float32)
        canary2[...] = jnp.zeros((Mp, 8), jnp.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 8), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        scratch_shapes=[
            pltpu.VMEM((NT, TM, Kp, Np), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(int(__import__("os").environ.get("C1_INTERPRET", "0"))),
    )

    run = jax.jit(lambda g, w: fn(g, w)[0])
    t0 = time.perf_counter()
    out = np.asarray(run(Gs, w0))
    print(f"[c1] compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    ref = np.asarray(
        jnp.einsum("abkn,abk->n", Gs, w0.reshape(NT, TM, Kp),
                   precision=jax.lax.Precision.HIGHEST)
    ).reshape(1, Np)
    err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30))
    ok = err < 1e-5

    times = []
    for r in range(3):
        wp = w0 * (1.0 + 1e-9 * (r + 1))
        t0 = time.perf_counter()
        np.asarray(run(Gs, wp))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    print(
        f"PROBE_C1 {{'variant': '{variant}', 'ok': {ok}, 'err': {err:.2e}, "
        f"'us_per_iter': {t / iters * 1e6:.1f}}}",
        flush=True,
    )


if __name__ == "__main__":
    main()
