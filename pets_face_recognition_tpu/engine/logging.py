"""Metric/artifact logging sink.

The reference logs through MLflow (``/root/reference/main.py:55-62``,
``engine/controller.py:188-189``; SURVEY.md §5). This environment has no MLflow
server, so the hub is a run directory with:

- ``metrics.jsonl``  — one JSON object per ``log_metrics`` call (step-stamped);
- ``params.json``    — hyperparameters snapshot;
- stdout mirroring (the reference also prints everything);
- optional real MLflow if the package is importable (kept API-compatible).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping

try:  # optional dependency — not in this image
    import mlflow  # type: ignore

    _HAS_MLFLOW = True
except Exception:  # pragma: no cover
    mlflow = None
    _HAS_MLFLOW = False


class MetricsLogger:
    """File + stdout metric logger with an MLflow-compatible surface."""

    def __init__(self, output_dir: str | Path, run_name: str = "run",
                 experiment_name: str = "default", use_mlflow: bool = False):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.run_name = run_name
        self._metrics_file = self.output_dir / "metrics.jsonl"
        self._mlflow_active = False
        if use_mlflow and _HAS_MLFLOW:  # pragma: no cover - env without mlflow
            mlflow.set_experiment(experiment_name)
            mlflow.start_run(run_name=run_name)
            self._mlflow_active = True

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        safe = {k: repr(v) for k, v in params.items()}
        (self.output_dir / "params.json").write_text(json.dumps(safe, indent=2))
        if self._mlflow_active:  # pragma: no cover
            mlflow.log_params({k: v[:250] for k, v in safe.items()})

    def log_metrics(self, metrics: Mapping[str, float], step: int = 0) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        with self._metrics_file.open("a") as f:
            f.write(json.dumps(record) + "\n")
        pretty = "  ".join(f"{k}={float(v):.6g}" for k, v in metrics.items())
        print(f"[step {step}] {pretty}", flush=True)
        if self._mlflow_active:  # pragma: no cover
            mlflow.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def log_artifact(self, path: str | Path) -> None:
        if self._mlflow_active:  # pragma: no cover
            mlflow.log_artifact(str(path))

    def finalize(self, status: str = "FINISHED") -> None:
        if self._mlflow_active:  # pragma: no cover
            mlflow.end_run(status=status)
