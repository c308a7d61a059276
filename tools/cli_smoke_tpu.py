"""Smoke-run every experiment CLI on the accelerator in f32 (VERDICT r4
item 5: the reference pins CPU x64 — ours must actually run on the chip).

Each CLI runs IN-PROCESS at small problem sizes with --dtype f32 where the
flag exists (the rest run f32 naturally: x64 is off in this process).
Writes results under CLI_SMOKE_DIR (default /tmp/cli_smoke_tpu) and prints
one PASS/FAIL line per CLI plus a SUMMARY line.

Usage: setsid nohup python tools/cli_smoke_tpu.py > logs/cli_smoke_tpu.log 2>&1 &
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

workdir = os.environ.get("CLI_SMOKE_DIR", "/tmp/cli_smoke_tpu")
os.makedirs(workdir, exist_ok=True)
os.chdir(workdir)
print(f"[cli_smoke] device={jax.devices()[0]} dir={workdir}", flush=True)

RUNS = [
    ("drone_risk", [
        "--alphas", "0.1", "0.2", "--repeats", "2", "--M", "50",
        "--mc-M", "2000", "--scp-iters", "15", "--dtype", "f32",
        "--plot", "--results", "results",
    ]),
    ("drone_gaussian", [
        "--alphas", "0.1", "--max-iter", "600", "--dtype", "f32",
        "--results", "results",
    ]),
    ("drone_times", [
        "--Ms", "20", "30", "--repeats", "2", "--scp-iters", "10",
        "--dtype", "f32", "--results", "results",
    ]),
    ("drone_main_plot", [
        "--alpha", "0.1", "--M", "50", "--mc-M", "2000",
        "--scp-iters", "15", "--dtype", "f32", "--plot",
        "--results", "results",
    ]),
    ("driving", [
        "--alphas", "0.05", "0.1", "--repeats", "2", "--M", "50",
        "--mc-M", "2000", "--scp-iters", "15", "--batched",
        "--dtype", "f32", "--plot", "--results", "results",
    ]),
    ("driving_gaussian", [
        "--alphas", "0.05", "0.1", "--scp-iters", "30", "--dtype", "f32",
        "--plot", "--results", "results",
    ]),
    ("hopper", [
        "--alphas", "0.3", "--mc-M", "2000", "--plot",
        "--results", "results",
    ]),
    ("terrains_gaussian", []),
]

results = {}
for name, argv in RUNS:
    t0 = time.time()
    try:
        mod = __import__(
            f"riskaversetrajopt_tpu.experiments.{name}", fromlist=["main"]
        )
        mod.main(argv)
        results[name] = f"PASS {time.time()-t0:.0f}s"
    except Exception as e:  # noqa: BLE001 — smoke must report every CLI
        traceback.print_exc()
        results[name] = f"FAIL {type(e).__name__}: {str(e)[:150]}"
    print(f"[cli_smoke] {name}: {results[name]}", flush=True)

ok = sum(1 for v in results.values() if v.startswith("PASS"))
print(f"[cli_smoke] SUMMARY {ok}/{len(RUNS)} passed", flush=True)
for name, v in results.items():
    print(f"  {name}: {v}", flush=True)
