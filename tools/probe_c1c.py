"""TPU probe round 3 for the fused-ADMM sweeps: TRANSPOSED (Kp, Mp) layout.

Findings so far (probe_c1 / probe_c1b at M=1000, Gs VMEM-resident):
  dot (batched (TM,1,Kp)@(TM,Kp,Np)): 196us/iter at TM=32, 177us at TM=128
      -> cost is ~180 cycles per SAMPLE (Mp batched matvecs), layout-bound.
  mr1/mr2/tvpu (VPU multiply+reduce with a non-singleton-leading broadcast
      operand): Mosaic "Invalid relayout" — does not lower.

Hypothesis: store ALL sample-row state transposed as (Kp, Mp) and G as
(Kp, Mp, Np). Then:
  sweep-1  = dot_general((Kp,1,Mp), (Kp,Mp,Np), batch 0, contract 2/1)
             -> Kp=64 batched matvecs with Mp=1024-long contractions
             (8x fewer batch elements, 16x longer contractions than `dot`)
             + a 2D axis-0 reduce (Kp,Np)->(1,Np) which compiles.
  sweep-2  = (Kp,Mp,Np) * u(1,1,Np) broadcast -> sum(axis=2) — exactly the
             all-singleton-leading broadcast form the production kernel's
             c2 already compiles and runs.
  per-sample reductions = 2D axis-0 reduces (Kp,Mp)->(1,Mp).

Variants:
  ks1      sweep-1 only (the previous bottleneck)
  ks1h     sweep-1 with precision HIGH (3-pass bf16x3) — halves MXU feed
  ks2      sweep-2 only
  kfull    sweep-1 + per-sample reductions + sweep-2 + row update
           (a realistic per-iteration floor, minus the small KKT solve)

Usage: python tools/probe_c1c.py <variant> [M] [iters]
Prints PROBE_C1C {variant, ok, err, us_per_iter}.
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
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from riskaversetrajopt_tpu.ops.pallas import saa_admm as pk
    from tools.probe_pallas import build_problem

    st, _ = build_problem(M)
    d = pk.kernel_dims(st, 32)
    Mp, Kp, Np = d.Mp, d.Kp, 128
    print(f"[c1c] dims Mp={Mp} Kp={Kp} iters={iters}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    GsK = jax.random.normal(k1, (Kp, Mp, Np), jnp.float32)  # transposed stack
    w0 = jax.random.normal(k2, (Kp, Mp), jnp.float32)
    u0 = jax.random.normal(k3, (1, Np), jnp.float32)

    prec = (jax.lax.Precision.HIGH if variant.endswith("h")
            else jax.lax.Precision.HIGHEST)

    def sweep1(gref, w):
        prod = jax.lax.dot_general(
            w[:, None, :], gref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (Kp, 1, Np)
        return jnp.sum(prod.reshape(Kp, Np), axis=0, keepdims=True)

    def sweep2(gref, u):
        return jnp.sum(gref[...] * u[None], axis=2)  # (Kp, Mp)

    def kernel(g_ref, w_ref, u_ref, out_ref, canary1, canary2, gvm, sem):
        cp = pltpu.make_async_copy(g_ref, gvm, sem)
        cp.start()
        cp.wait()

        if variant in ("ks1", "ks1h"):
            def iter_step(i, carry):
                scale = 1.0 + carry * 1e-30
                acc = sweep1(gvm, w_ref[...] * scale)
                return acc[0, 0]

            final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
            out_ref[...] = sweep1(gvm, w_ref[...] * (1.0 + final * 1e-30))
        elif variant == "ks2":
            def iter_step(i, carry):
                scale = 1.0 + carry * 1e-30
                z = sweep2(gvm, u_ref[...] * scale)
                return z[0, 0]

            final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
            z = sweep2(gvm, u_ref[...] * (1.0 + final * 1e-30))
            out_ref[...] = z[0:1, 0:Np]
        elif variant == "kfull":
            def iter_step(i, carry):
                scale = 1.0 + carry * 1e-30
                w = w_ref[...] * scale
                acc = sweep1(gvm, w)  # (1, Np)
                rowsum = jnp.sum(w, axis=0, keepdims=True)  # (1, Mp)
                zt = sweep2(gvm, acc) - 1e-6 * w  # (Kp, Mp)
                z_new = jnp.clip(zt + 1e-3 * w, -1.0, 1.0)
                yd = w + 0.5 * (zt - z_new)
                return carry * 1e-30 + jnp.sum(rowsum[0, 0:1]) + yd[0, 0]

            final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
            out_ref[...] = sweep1(gvm, w_ref[...] * (1.0 + final * 1e-30))
        else:
            raise ValueError(variant)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        scratch_shapes=[
            pltpu.VMEM((Kp, Mp, Np), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(int(__import__("os").environ.get("C1_INTERPRET", "0"))),
    )

    run = jax.jit(lambda g, w, u: fn(g, w, u)[0])
    t0 = time.perf_counter()
    out = np.asarray(run(GsK, w0, u0))
    print(f"[c1c] compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    if variant in ("ks1", "ks1h", "kfull"):
        ref = np.asarray(
            jnp.einsum("kmn,km->n", GsK, w0,
                       precision=jax.lax.Precision.HIGHEST)
        ).reshape(1, Np)
        tol = 1e-5 if variant != "ks1h" else 3e-4
    else:
        ref = np.asarray(
            jnp.einsum("kmn,n->km", GsK, u0[0],
                       precision=jax.lax.Precision.HIGHEST)
        )[0:1, 0:Np]
        tol = 1e-5
    err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30))
    ok = err < tol

    times = []
    for r in range(3):
        wp = w0 * (1.0 + 1e-9 * (r + 1))
        up = u0 * (1.0 + 1e-9 * (r + 1))
        t0 = time.perf_counter()
        np.asarray(run(GsK, wp, up))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    print(
        f"PROBE_C1C {{'variant': '{variant}', 'ok': {ok}, "
        f"'err': {err:.2e}, 'us_per_iter': {t / iters * 1e6:.1f}}}",
        flush=True,
    )


if __name__ == "__main__":
    main()
