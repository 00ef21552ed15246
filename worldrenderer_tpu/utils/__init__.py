"""Experiment scaffolding: config, base classes, logging, saving, profiling.

Reference layer L5 (mvadapter/utils/{config,core,base,misc,callbacks,saving,
logging,typing}.py), rebuilt without OmegaConf / pytorch_lightning.
"""

from .config import (
    ExperimentConfig,
    dump_config,
    load_config,
    parse_structured,
    register_resolver,
)
from .base import BaseObject, Configurable, Updateable, update_if_possible
from .misc import (
    C,
    TimeRecorder,
    device_memory_stats,
    find,
    get_rank,
    load_checkpoint,
    save_checkpoint,
    time_recorder,
)
from .logging import get_logger, set_verbosity
from .saving import SaverMixin
from .debug import annotate, check_finite, debug_nans, trace
from .callbacks import (
    CodeSnapshotCallback,
    ConfigSnapshotCallback,
    ProgressCallback,
)

__all__ = [
    "ExperimentConfig",
    "load_config",
    "dump_config",
    "parse_structured",
    "register_resolver",
    "Configurable",
    "Updateable",
    "BaseObject",
    "update_if_possible",
    "C",
    "TimeRecorder",
    "time_recorder",
    "device_memory_stats",
    "get_rank",
    "find",
    "load_checkpoint",
    "save_checkpoint",
    "get_logger",
    "set_verbosity",
    "SaverMixin",
    "annotate",
    "check_finite",
    "debug_nans",
    "trace",
    "CodeSnapshotCallback",
    "ConfigSnapshotCallback",
    "ProgressCallback",
]
