"""TPU probe round 2 for the fused-ADMM sweep-1 contraction (A^T G-sweep).

probe_c1 results at M=1000 (TM=32, Gs VMEM-resident):
  dot  (batched (TM,1,Kp)@(TM,Kp,Np) matvec)  195.8 us/iter — codegen-bound:
       Mosaic lowers it as Mp individual MXU matvecs (~180 cycles each).
  mr1 / mr2 (multiply + reduce over the MIDDLE axis of (TM,Kp,Np)):
       Mosaic "Invalid relayout: non-singleton logical dimension is
       replicated in destination but not in source" — the middle-axis
       reduce of a lane-broadcast product does not lower on this target.

This probe tests the remaining candidates:

  tvpu — mirror the WORKING sweep-2 pattern (broadcast over the middle
       axis, reduce over the minormost/lane axis) by storing G TRANSPOSED
       and SAMPLE-PAIR-PACKED: tile t2 holds two TM-sample tiles, shape
       (TM, Np, 128) with lanes [0:Kp]=tile 2*t2, [Kp:2Kp]=tile 2*t2+1
       (Kp=64 -> no padding waste; same 33.5 MB as the untransposed stack).
       w is packed per-pair by lane-concatenation. The multiply-reduce
       (TM,Np,128)*(TM,1,128) -> sum(axis=2) is exactly the op sweep-2
       already compiles and runs.
  dot with TM in {8, 128} — does the batched-matvec cost scale with tile
       count or with total sample count? (answers whether bigger tiles help)

Usage: python tools/probe_c1b.py <variant> [M] [TM] [iters]
Prints PROBE_C1B {variant, ok, err, us_per_iter}.
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
    assert 2 * Kp == 128, "pair-packing assumes Kp == 64"
    NT2 = NT // 2
    print(f"[c1b] dims NT={NT} TM={TM} Mp={Mp} Kp={Kp} iters={iters}",
          flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    Gs = jax.random.normal(k1, (NT, TM, Kp, Np), jnp.float32)
    w0 = jax.random.normal(k2, (Mp, Kp), jnp.float32)

    if variant == "tvpu":
        # (NT2, TM, Np, 2*Kp): lanes [0:Kp] = tile 2*t2, [Kp:2Kp] = 2*t2+1
        GsT = jnp.concatenate(
            [
                jnp.transpose(Gs[0::2], (0, 1, 3, 2)),
                jnp.transpose(Gs[1::2], (0, 1, 3, 2)),
            ],
            axis=3,
        )

        def kernel(gst_ref, w_ref, out_ref, canary1, canary2, gtile, sem):
            cp = pltpu.make_async_copy(gst_ref, gtile, sem)
            cp.start()
            cp.wait()

            def rows(t):
                return pl.ds(t * TM, TM)

            def sweep(scale):
                acc = jnp.zeros((TM, Np), jnp.float32)
                for t2 in range(NT2):
                    w_pair = jnp.concatenate(
                        [w_ref[rows(2 * t2), :], w_ref[rows(2 * t2 + 1), :]],
                        axis=1,
                    ) * scale  # (TM, 2*Kp)
                    acc = acc + jnp.sum(
                        gtile[t2] * w_pair[:, None, :], axis=2
                    )
                return jnp.sum(acc, axis=0, keepdims=True)

            def iter_step(i, carry):
                scale = 1.0 + carry * 1e-30
                acc = sweep(scale)
                return acc[0, 0]

            final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
            out_ref[...] = sweep(1.0 + final * 1e-30)
            canary1[...] = jnp.zeros((1, Np), jnp.float32)
            canary2[...] = jnp.zeros((Mp, 8), jnp.float32)

        gtile_shape = (NT2, TM, Np, 2 * Kp)
        args = (GsT, w0)
    elif variant == "dot":
        def kernel(gs_ref, w_ref, out_ref, canary1, canary2, gtile, sem):
            cp = pltpu.make_async_copy(gs_ref, gtile, sem)
            cp.start()
            cp.wait()

            def rows(t):
                return pl.ds(t * TM, TM)

            def sweep(scale):
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

            def iter_step(i, carry):
                scale = 1.0 + carry * 1e-30
                acc = sweep(scale)
                return acc[0, 0]

            final = jax.lax.fori_loop(0, iters, iter_step, jnp.float32(0.0))
            out_ref[...] = sweep(1.0 + final * 1e-30)
            canary1[...] = jnp.zeros((1, Np), jnp.float32)
            canary2[...] = jnp.zeros((Mp, 8), jnp.float32)

        gtile_shape = (NT, TM, Kp, Np)
        args = (Gs, w0)
    else:
        raise ValueError(variant)

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
            pltpu.VMEM(gtile_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(int(__import__("os").environ.get("C1_INTERPRET", "0"))),
    )

    run = jax.jit(lambda g, w: fn(g, w)[0])
    t0 = time.perf_counter()
    out = np.asarray(run(*args))
    print(f"[c1b] compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    ref = np.asarray(
        jnp.einsum("abkn,abk->n", Gs, w0.reshape(NT, TM, Kp),
                   precision=jax.lax.Precision.HIGHEST)
    ).reshape(1, Np)
    err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30))
    ok = err < 1e-5

    times = []
    for r in range(3):
        wp = w0 * (1.0 + 1e-9 * (r + 1))
        a = (args[0], wp)
        t0 = time.perf_counter()
        np.asarray(run(*a))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    print(
        f"PROBE_C1B {{'variant': '{variant}', 'TM': {TM}, 'ok': {ok}, "
        f"'err': {err:.2e}, 'us_per_iter': {t / iters * 1e6:.1f}}}",
        flush=True,
    )


if __name__ == "__main__":
    main()
