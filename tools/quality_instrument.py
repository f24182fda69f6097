"""Quality instrument: candR@K on the HARD smoke corpus across serving
configurations (VERDICT r3 #3).

The easy smoke split saturates Recall@K=1.0, so fidelity claims ("int8
didn't break anything") had no denominator. This tool runs the full
detect→align→embed→score→rank chain (the unmodified ``generate_tsv_to_
reproduce2.py`` head pipeline, or ``...1.py`` ensemble with ``--ensemble``)
over ``tools/make_smoke_datasets.py::make_kashtanka_hard`` — a few hundred
near-duplicate identities where ranking is genuinely hard — and tables
candR@1/10/100 per configuration:

- float vs int8 PTQ (``PFR_QUANT_MODE``, models/ptq.py),
- resnet50 vs mobile keypoint detector (``PFR_KEYPOINT_ARCH``),
- float32 vs bfloat16 device inputs (``PFR_INPUT_DTYPE``).

candR@K (the README's metric, ref ``README.md:89-105``): the fraction of
query cards whose true-match card appears in the top-K of the ranked answer
list. Queries that produced no tsv row (detection failed on every image)
count as misses.

Usage (after tools/drive_smoke_e2e.sh has produced checkpoints):
  python tools/quality_instrument.py --data /tmp/pfr_smoke/test_hard \
      --gt /tmp/pfr_smoke/hard_gt.json --out /tmp/pfr_quality
Writes ``<out>/quality_table.json`` and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent


def cand_recall(tsv: Path, gt: dict[str, str], ks=(1, 10, 100)) -> dict:
    df = pd.read_csv(tsv, sep="\t").set_index("query")
    hits = {k: 0 for k in ks}
    found_rows = 0
    for q, match in gt.items():
        if q not in df.index:
            continue  # no prediction -> miss at every K
        found_rows += 1
        ranked = str(df.loc[q, "answer"]).split(",")
        for k in ks:
            if match in ranked[:k]:
                hits[k] += 1
    n = len(gt)
    out = {f"candR@{k}": round(hits[k] / n, 4) for k in ks}
    out["queries_with_rows"] = found_rows
    out["queries_total"] = n
    return out


def run_pass(name: str, env_overrides: dict, data: Path, out_dir: Path,
             ensemble: bool, quant_state: Path) -> Path:
    """One chain pass; calibrates first when the pass wants int8."""
    script = ("generate_tsv_to_reproduce1.py" if ensemble
              else "generate_tsv_to_reproduce2.py")
    tsv = out_dir / f"tsv_{name}.tsv"

    def _run(mode):
        env = dict(os.environ)
        env.update(env_overrides)
        env["PFR_QUANT_MODE"] = mode
        env["PFR_QUANT_STATE"] = str(quant_state)
        cmd = [sys.executable, script, "--data", str(data),
               "--stock-preds", "/nonexistent", "--output", str(tsv)]
        print(f"[{name}] PFR_QUANT_MODE={mode!r} "
              + " ".join(f"{k}={v}" for k, v in env_overrides.items()))
        subprocess.run(cmd, check=True, cwd=REPO, env=env)

    if env_overrides.pop("_int8", False):
        _run("calibrate")
        _run("int8")
    else:
        _run("")
    return tsv


_SHIP = "embedder,kp_head"  # shipping default: detector int8 stays opt-in
_ALL = "embedder,detector,kp_head"
CONFIGS = {
    # name -> env overrides; "_int8" triggers the calibrate→int8 two-pass.
    # "int8" rows = ALL components (incl. the opt-in detector quant);
    # "int8ship" rows = the SHIPPING config (embedder+kp_head int8, float
    # detector — PERF.md round-4 rank-safety decomposition).
    # Every int8 row pins PFR_QUANT_COMPONENTS EXPLICITLY: round 4's "int8"
    # cell silently inherited a lingering components export from the parent
    # shell and measured the shipping config while labeled all-components
    # (caught round 5 by byte-identical tsvs + a kp_head-only quant state).
    "float_resnet50_f32": {},
    "int8_resnet50_f32": {"_int8": True, "PFR_QUANT_COMPONENTS": _ALL},
    "int8ship_resnet50_f32": {"_int8": True, "PFR_QUANT_COMPONENTS": _SHIP},
    "float_resnet50_bf16in": {"PFR_INPUT_DTYPE": "bfloat16"},
    "int8_resnet50_bf16in": {"_int8": True, "PFR_INPUT_DTYPE": "bfloat16",
                             "PFR_QUANT_COMPONENTS": _ALL},
    "int8ship_resnet50_bf16in": {"_int8": True, "PFR_INPUT_DTYPE": "bfloat16",
                                 "PFR_QUANT_COMPONENTS": _SHIP},
    # mobile detector rows need PFR_KEYPOINT_CKPT pointing at a
    # mobile-arch checkpoint (configs/smoke/keypoint_mobile_smoke.py)
    "float_mobile_f32": {"PFR_KEYPOINT_ARCH": "mobile"},
    "int8_mobile_f32": {"_int8": True, "PFR_KEYPOINT_ARCH": "mobile",
                        "PFR_QUANT_COMPONENTS": _ALL},
}


def resolve_smoke_env() -> None:
    """Default the checkpoint/threshold env contract off ``results_smoke``
    run dirs (same resolution as tools/rank_safety_drive.sh) so the
    instrument is turnkey after tools/drive_smoke_e2e.sh. Explicit env
    always wins."""
    def latest_by_cfg(cfg_name: str) -> str:
        runs = sorted(REPO.glob("results_smoke/*/"),
                      key=lambda p: p.name, reverse=True)
        for d in runs:
            if (d / cfg_name).exists() and any((d / "checkpoints").glob("*")):
                return str(d / "checkpoints")
        raise SystemExit(f"no results_smoke run with {cfg_name}")

    defaults = {
        "PFR_KEYPOINT_CKPT": lambda: latest_by_cfg("keypoint_smoke.py"),
        "PFR_MASK_CKPT": lambda: latest_by_cfg("mask_smoke.py"),
        "PFR_RETRIEVAL_THR": lambda: "0.5",  # smoke detectors are weak
    }
    fe = None
    for var in ("PFR_CAT_HEAD_FE_CKPT", "PFR_DOG_HEAD_FE_CKPT",
                "PFR_CAT_BODY_FE_CKPT", "PFR_DOG_BODY_FE_CKPT"):
        if var not in os.environ:
            fe = fe or latest_by_cfg("fe_smoke.py")
            os.environ[var] = fe
    for var, fn in defaults.items():
        if var not in os.environ:
            os.environ[var] = fn()
    for var in sorted(v for v in os.environ if v.startswith("PFR_")):
        print(f"  {var}={os.environ[var]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=Path, required=True)
    ap.add_argument("--gt", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=Path("/tmp/pfr_quality"))
    ap.add_argument("--ensemble", action="store_true",
                    help="run the head+body ensemble chain (reproduce1) "
                         "instead of head-only (reproduce2)")
    ap.add_argument("--configs", nargs="*", default=None,
                    help=f"subset of {sorted(CONFIGS)} (default: the four "
                         "resnet50 rows; add mobile rows when a mobile "
                         "checkpoint is available)")
    ap.add_argument("--mobile-ckpt", type=Path, default=None,
                    help="mobile keypoint checkpoint dir (enables the "
                         "mobile rows)")
    args = ap.parse_args()

    resolve_smoke_env()
    gt = json.loads(args.gt.read_text())
    args.out.mkdir(parents=True, exist_ok=True)
    names = args.configs
    if names is None:
        names = [n for n in CONFIGS if "mobile" not in n]
        if args.mobile_ckpt is not None:
            names += [n for n in CONFIGS if "mobile" in n]

    # merge into an existing table so the grid can be filled incrementally
    # (chain passes are 12-20 min each on the chip)
    table_path = args.out / "quality_table.json"
    table = json.loads(table_path.read_text()) if table_path.exists() else {}
    for name in names:
        overrides = dict(CONFIGS[name])
        if "mobile" in name:
            if args.mobile_ckpt is None:
                print(f"skip {name}: no --mobile-ckpt")
                continue
            overrides["PFR_KEYPOINT_CKPT"] = str(args.mobile_ckpt)
        tsv = run_pass(name, overrides, args.data, args.out,
                       args.ensemble, args.out / f"quant_{name}.pkl")
        table[name] = cand_recall(tsv, gt)
        print(name, table[name])

    table_path.write_text(json.dumps(table, indent=2))
    ks = ("candR@1", "candR@10", "candR@100")
    print("\n| config | " + " | ".join(ks) + " | rows |")
    print("|---|" + "---|" * (len(ks) + 1))
    for name, m in table.items():
        print(f"| {name} | " + " | ".join(str(m[k]) for k in ks)
              + f" | {m['queries_with_rows']}/{m['queries_total']} |")


if __name__ == "__main__":
    main()
