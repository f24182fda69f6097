"""int8 detector-scope composition sweep (VERDICT r3 #2 / r4 #3).

Round-3 measured: int8 FPN and int8 RPN each speed up the resnet50 quality
pipeline ALONE, but quantizing BOTH regresses the full detect graph by
~21 ms (downstream RoI stages balloon). This tool runs the full factorial —

    scope ∈ {trunk, fpn, rpn, full} × detect-split ∈ {off, on}

— through ``bench.py --detector resnet50 --int8-detector`` and records every
JSON result plus the float baseline into one file. ``--detect-split``
compiles the int8 producer chain (backbone/FPN/RPN head) and the RoI
consumer stages as separate XLA modules, which isolates whether the
pathology is a cross-stage *scheduling* artifact of the remote compiler
(split restores the per-scope wins) or intrinsic to the int8 graphs (split
changes nothing).

Usage:
  python tools/sweep_int8_scopes.py --out /tmp/pfr_scope_sweep.json \
      [--iters 50] [--passes 2]
  python tools/sweep_int8_scopes.py --cpu --out /tmp/pfr_scope_cpu.json

``--cpu`` times the DETECT graph per scope on CPU-XLA in-process (tiny
batch, relative numbers only; the align/embed stages are scope-invariant) to
separate remote-TPU-scheduler behavior from the model itself.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_bench(args_list, env=None, timeout=2400):
    cmd = [sys.executable, "bench.py", *args_list]
    print("::", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout, env=env)
    last_json = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last_json = json.loads(line)
            except json.JSONDecodeError:
                pass
    if last_json is None:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        raise RuntimeError(f"no JSON line from {cmd}")
    return last_json


def cpu_sweep(out: Path, scopes, batch=4, iters=3):
    """Time the jitted DETECT forward per int8 scope on CPU-XLA."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bench import build_serving_models

    results = json.loads(out.read_text()) if out.exists() else {}
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, 320, 320, 3), jnp.float32)

    def time_detect(name, det_q, q_fpn, q_rpn):
        if name in results:
            print(f"skip {name} (already recorded)")
            return
        detector, _, _, _ = build_serving_models(
            detector_kind="resnet50", rpn_pre=24, rpn_post=8,
            detector_quant=det_q, quant_fpn=q_fpn, quant_rpn=q_rpn)
        if det_q:
            det_init, _, _, _ = build_serving_models(
                detector_kind="resnet50", rpn_pre=24, rpn_post=8,
                detector_quant="calibrate", quant_fpn=q_fpn, quant_rpn=q_rpn)
        else:
            det_init = detector
        det_vars = jax.jit(
            lambda r, x: det_init.init(r, x, train=False)
        )(jax.random.PRNGKey(0), images)

        @jax.jit
        def detect(imgs):
            return detector.apply(det_vars, imgs,
                                  train=False)["keypoints"][:, 0, :, :2]

        detect(images).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            r = detect(images)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        results[name] = {"detect_ms_per_batch": round(dt * 1e3, 1),
                         "batch": batch, "iters": iters,
                         "backend": "cpu"}
        out.write_text(json.dumps(results, indent=2))
        print(f"{name}: {results[name]['detect_ms_per_batch']} ms/batch")

    time_detect("float", None, False, False)
    for scope in scopes:
        time_detect(f"int8_{scope}", "int8",
                    scope in ("fpn", "full"), scope in ("rpn", "full"))
    print(json.dumps(results, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path,
                    default=Path("/tmp/pfr_scope_sweep.json"))
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scopes", nargs="*",
                    default=["trunk", "fpn", "rpn", "full"])
    args = ap.parse_args()

    if args.cpu:
        cpu_sweep(args.out, args.scopes, batch=args.batch_size or 4,
                  iters=args.iters if args.iters != 50 else 3)
        return

    base = ["--detector", "resnet50",
            "--batch-size", str(args.batch_size or 128),
            "--iters", str(args.iters), "--passes", str(args.passes)]

    results = {}
    if args.out.exists():
        results = json.loads(args.out.read_text())  # resume partial sweeps

    def record(name, cli):
        if name in results:
            print(f"skip {name} (already recorded)")
            return
        results[name] = run_bench(base + cli)
        args.out.write_text(json.dumps(results, indent=2))
        print(f"{name}: {results[name]['value']} {results[name]['unit']}")

    record("float", [])
    record("float_split", ["--detect-split"])
    for scope in args.scopes:
        record(f"int8_{scope}",
               ["--int8-detector", "--int8-detector-scope", scope])
        record(f"int8_{scope}_split",
               ["--int8-detector", "--int8-detector-scope", scope,
                "--detect-split"])

    print("\n| config | crops/s (split off) | crops/s (split on) |")
    print("|---|---|---|")
    for scope in ["float"] + [f"int8_{s}" for s in args.scopes]:
        off = results.get(scope, {}).get("value", "-")
        on = results.get(f"{scope}_split", {}).get("value", "-")
        print(f"| {scope} | {off} | {on} |")


if __name__ == "__main__":
    main()
