"""Train a feature extractor from a ``--config`` file.

Entry-point parity with the reference ``main.py``: timestamped run directory,
config snapshot copied into it, metrics logger wiring, then ``trainer.fit``.
TPU-native: one SPMD process drives the whole mesh (no DDP fork), and the logger
is the file/stdout MetricsLogger with optional MLflow.
"""

import argparse
import os
import shutil
import warnings
from datetime import datetime
from pathlib import Path

from pets_face_recognition_tpu.engine import Controller, MetricsLogger, configure_trainer
from pets_face_recognition_tpu.parallel import create_mesh
from pets_face_recognition_tpu.utils import (
    enable_compilation_cache,
    get_config,
    is_main_process,
)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True, type=Path,
                        help="Path to config file")
    return parser.parse_args()


def setup_run(config, config_path: Path):
    """Create the timestamped run dir, snapshot the config, build the logger."""
    logger = None
    if is_main_process():
        restime = datetime.now().strftime("%Y%m%d-%H%M%S")
        run_output_root = Path(config.output) / restime
        config.output = run_output_root
        config.checkpoint_path = run_output_root / "checkpoints"
        config.img_dir = run_output_root / "img"
        config.checkpoint_path.mkdir(parents=True, exist_ok=True)
        config.img_dir.mkdir(exist_ok=True)
        shutil.copy2(config_path, run_output_root)

        user = os.environ.get("LOGNAME", os.environ.get("USERNAME", "unknown"))
        logger = MetricsLogger(
            run_output_root,
            run_name=config.get("run_name", f"{user}-default"),
            experiment_name=config.get("experiment_name", "default"),
            use_mlflow=config.get("mlflow_target_uri") is not None,
        )
        logger.log_hyperparams(dict(config.items()))
    return logger


def main(controller_cls=Controller):
    warnings.simplefilter("ignore")
    enable_compilation_cache()
    args = parse_args()
    config = get_config(args.config)
    logger = setup_run(config, args.config)

    mesh = create_mesh()
    controller = controller_cls(config, mesh=mesh)
    trainer = configure_trainer(
        config, logger, mesh=mesh,
        default_root_dir=config.get("output", "."),
    )
    trainer.fit(controller)
    print("Completed!")
    return trainer


if __name__ == "__main__":
    main()
