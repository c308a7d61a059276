"""Regenerate the committed golden-trajectory fixtures in tests/fixtures/.

Each golden is produced by driving the ACTUAL reference SCP loop
(/root/reference, via tools/reference_oracle.py with the tightened
independent QP engine) on this framework's sampled omegas. The M=1000 drone
golden takes ~30 min on CPU x64 (the post-gating transition QPs need ~20k
ADMM iterations each); CI therefore loads the committed fixture instead of
re-running the oracle loop — re-run this script after any change to the
samplers or to the reference-loop semantics:

    PYTHONPATH=/root/repo python tools/make_goldens.py [--m50-only]

Determinism: fixtures depend only on jax.random.PRNGKey(0) sampling and the
oracle ADMM (seeded, deterministic); they are stable across machines.
"""

import argparse
import time
from pathlib import Path

import numpy as np

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m50-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from riskaversetrajopt_tpu.core.config import DroneScenario
    from riskaversetrajopt_tpu.models.drone import DroneModel
    from tools import reference_oracle as ro

    ro.StubOSQP.eps_override = 1e-6
    ro.StubOSQP.max_iter_override = 400000
    ns = ro.load_reference_script("drone/drone_risk.py")

    configs = [(50, 0.2, 0, 15)]
    if not args.m50_only:
        configs.append((1000, 0.2, 0, 15))
    FIXTURES.mkdir(exist_ok=True)
    for M, alpha, seed, iters in configs:
        print(f"[goldens] drone M={M} alpha={alpha} seed={seed} "
              f"iters={iters}", flush=True)
        ro.set_reference_M(ns, M)
        model = DroneModel(DroneScenario(M=M))
        om = model.sample(jax.random.PRNGKey(seed), M=M)
        ref = ro.reference_drone_model(ns, om, alpha)
        t0 = time.time()
        gold, _ = ro.run_reference_scp_drone(ns, ref, iters)
        out = FIXTURES / (
            f"gold_drone_m{M}_a{alpha}_seed{seed}_iters{iters}.npy"
        )
        np.save(out, gold)
        print(f"  -> {out} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
