"""TPU probe round 4: LANE-FLAT layout with single big MXU matmuls.

probe_c1c showed the batched (Kp,1,Mp)@(Kp,Mp,Np) dot_general costs
155 us/iter — Mosaic pays ~2.4 us of overhead PER BATCH ELEMENT, so any
batched-matvec form is dead. The remaining design stores all sample-row
state LANE-FLAT as (1, Kp*Mp) (flat index k*Mp + i, k-major) so that both
sweeps become ONE unbatched MXU matmul each in the documented-exact
(8, X) @ (X, Y) broadcast-lhs form (see saa_admm.py:_solve_kkt NOTE:
a (1,128)@(128,128) dot miscompiles; an (8,·) lhs is exact):

  sweep-1: out(1,Np)   = bcast8(w_flat (1,KpMp)) @ G2 (KpMp, Np), row 0
  sweep-2: zt (1,KpMp) = bcast8(u (1,Np)) @ G2T (Np, KpMp), row 0
  rowsum:  (1,Mp)      = sum of Kp static Mp-aligned lane slices of w_flat
  tile:    (1,KpMp)    = pltpu.repeat(y_row (1,Mp), Kp, axis=1)

Variants:
  bd1   sweep-1 matmul only
  bd1h  sweep-1 at precision HIGH (3-pass)
  bd2   sweep-2 matmul only (needs the (Np, KpMp) transposed copy)
  aux   rowsum-by-slices + repeat-tile + elementwise row update only
  full  sweep-1 + rowsum + small mock solve + sweep-2 + tile + row update
  fullh full at precision HIGH

Usage: python tools/probe_c1d.py <variant> [M] [iters]
Prints PROBE_C1D {variant, ok, err, us_per_iter}.
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

    from riskaversetrajopt_tpu.ops.pallas.experimental import saa_admm as pk
    from tools.probe_pallas import build_problem

    st, _ = build_problem(M)
    d = pk.kernel_dims(st, 32)
    Mp, Kp, Np = d.Mp, d.Kp, 128
    F = Kp * Mp
    print(f"[c1d] dims Mp={Mp} Kp={Kp} F={F} iters={iters}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    G2 = jax.random.normal(k1, (F, Np), jnp.float32)  # row k*Mp+i
    w0 = jax.random.normal(k2, (1, F), jnp.float32)
    u0 = jax.random.normal(k3, (1, Np), jnp.float32)

    prec = (jax.lax.Precision.HIGH if variant.endswith("h")
            else jax.lax.Precision.HIGHEST)
    base = variant[:-1] if variant.endswith("h") else variant

    need_g2 = base in ("bd1", "full")
    need_g2t = base in ("bd2", "full")

    def kernel(*refs):
        if need_g2 and need_g2t:
            g2_ref, g2t_ref, w_ref, u_ref = refs[:4]
            out_ref, canary1, canary2 = refs[4:7]
            g2vm, g2tvm, sem = refs[7:]
        elif need_g2:
            g2_ref, w_ref, u_ref = refs[:3]
            out_ref, canary1, canary2 = refs[3:6]
            g2vm, sem = refs[6:]
            g2tvm = None
        elif need_g2t:
            g2t_ref, w_ref, u_ref = refs[:3]
            out_ref, canary1, canary2 = refs[3:6]
            g2tvm, sem = refs[6:]
            g2vm = None
        else:
            w_ref, u_ref = refs[:2]
            out_ref, canary1, canary2 = refs[2:5]
            (sem,) = refs[5:]
            g2vm = g2tvm = None

        if g2vm is not None:
            cp = pltpu.make_async_copy(g2_ref, g2vm, sem.at[0])
            cp.start()
            cp.wait()
        if g2tvm is not None:
            cp = pltpu.make_async_copy(g2t_ref, g2tvm, sem.at[1])
            cp.start()
            cp.wait()

        def sweep1(w):
            return jnp.dot(
                jnp.broadcast_to(w, (8, F)), g2vm[...],
                preferred_element_type=jnp.float32, precision=prec,
            )[0:1, :]  # (1, Np)

        def sweep2(u):
            return jnp.dot(
                jnp.broadcast_to(u, (8, Np)), g2tvm[...],
                preferred_element_type=jnp.float32, precision=prec,
            )[0:1, :]  # (1, F)

        def rowsum(w):
            acc = w[:, 0:Mp]
            for k in range(1, Kp):
                acc = acc + w[:, k * Mp : (k + 1) * Mp]
            return acc  # (1, Mp)

        def tile_row(r):
            return pltpu.repeat(r, Kp, axis=1)  # (1, F)

        if base == "bd1":
            def step(i, carry):
                s = 1.0 + carry * 1e-30
                acc = sweep1(w_ref[...] * s)
                return acc[0, 0]

            final = jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
            out_ref[...] = sweep1(w_ref[...] * (1.0 + final * 1e-30))
        elif base == "bd2":
            def step(i, carry):
                s = 1.0 + carry * 1e-30
                z = sweep2(u_ref[...] * s)
                return z[0, 0]

            final = jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
            out_ref[...] = sweep2(u_ref[...] * (1.0 + final * 1e-30))[:, 0:Np]
        elif base == "aux":
            def step(i, carry):
                s = 1.0 + carry * 1e-30
                w = w_ref[...] * s
                rs = rowsum(w)
                corr = tile_row(rs)
                z_new = jnp.clip(w - 1e-3 * corr, -1.0, 1.0)
                yd = w + 0.5 * (w - z_new)
                return carry * 1e-30 + yd[0, 0] + rs[0, 0]

            final = jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
            out_ref[...] = rowsum(w_ref[...] * (1.0 + final * 1e-30))[:, 0:Np]
        elif base == "full":
            def step(i, carry):
                s = 1.0 + carry * 1e-30
                w = w_ref[...] * s
                acc = sweep1(w)  # (1, Np)
                rs = rowsum(w)  # (1, Mp)
                u_t = acc * (1.0 + rs[0, 0] * 1e-30)  # mock solve dep
                zt = sweep2(u_t) - 1e-6 * tile_row(rs)  # (1, F)
                z_new = jnp.clip(zt + 1e-3 * w, -1.0, 1.0)
                yd = w + 0.5 * (zt - z_new)
                return carry * 1e-30 + yd[0, 0]

            final = jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
            out_ref[...] = sweep1(w_ref[...] * (1.0 + final * 1e-30))
        else:
            raise ValueError(variant)
        canary1[...] = jnp.zeros((1, Np), jnp.float32)
        canary2[...] = jnp.zeros((Mp, 8), jnp.float32)

    in_arrays = []
    in_specs = []
    scratch = []
    if need_g2:
        in_arrays.append(G2)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((F, Np), jnp.float32))
    if need_g2t:
        in_arrays.append(G2.T)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((Np, F), jnp.float32))
    in_arrays += [w0, u0]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    fn = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 8), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(int(__import__("os").environ.get("C1_INTERPRET", "0"))),
    )

    run = jax.jit(lambda *a: fn(*a)[0])
    t0 = time.perf_counter()
    out = np.asarray(run(*in_arrays))
    print(f"[c1d] compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    tol = 3e-4 if variant.endswith("h") else 1e-5
    if base in ("bd1", "full"):
        ref = np.asarray(
            jnp.einsum("f,fn->n", w0[0], G2,
                       precision=jax.lax.Precision.HIGHEST)
        ).reshape(1, Np)
    elif base == "bd2":
        ref = np.asarray(
            jnp.einsum("n,nf->f", u0[0], G2.T,
                       precision=jax.lax.Precision.HIGHEST)
        ).reshape(1, F)[:, 0:Np]
    else:  # aux
        ref = np.asarray(w0.reshape(Kp, Mp).sum(axis=0)).reshape(1, Mp)[:, 0:Np]
    err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30))
    ok = err < tol

    times = []
    for r in range(3):
        a = list(in_arrays)
        a[-2] = w0 * (1.0 + 1e-9 * (r + 1))
        t0 = time.perf_counter()
        np.asarray(run(*a))
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    print(
        f"PROBE_C1D {{'variant': '{variant}', 'ok': {ok}, "
        f"'err': {err:.2e}, 'us_per_iter': {t / iters * 1e6:.1f}}}",
        flush=True,
    )


if __name__ == "__main__":
    main()
