"""Training/eval engine.

Exports mirror the reference's ``engine/__init__.py:1-4`` surface: the task
controllers and the Trainer.
"""

from .controller import Controller
from .detector_controller import DetectionController, KeyPointsController
from .trainer import Trainer, configure_trainer
from .train_state import TrainState
from .logging import MetricsLogger
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_params,
    merge_params,
    save_checkpoint,
)

__all__ = [
    "Controller",
    "DetectionController",
    "KeyPointsController",
    "Trainer",
    "configure_trainer",
    "TrainState",
    "MetricsLogger",
    "save_checkpoint",
    "load_checkpoint",
    "load_params",
    "latest_checkpoint",
    "merge_params",
]
