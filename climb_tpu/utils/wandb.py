"""Lazy-init W&B logger singleton (parity: reference ``src/utils/wandb.py``).

``log()`` is a no-op until ``initialize()`` is called; ``get_log_freq()``
defaults to 100 when uninitialized. The ``wandb`` package import is deferred
and optional so the framework runs in hermetic environments.
"""

import logging
import os

logger = logging.getLogger(__name__)


class WandBLogger:
    def __init__(self):
        self.is_initialized = False
        self.log_freq = 100
        self._history = []  # kept for tests/offline inspection

    def initialize(self, wandb_config: dict, experiment_name: str):
        try:
            import wandb  # noqa: deferred optional dependency
        except ImportError:
            logger.warning("wandb not installed; logging to in-memory history only")
            self.is_initialized = True
            self.log_freq = wandb_config.get("log_freq", 100)
            self._wandb = None
            return
        os.environ["WANDB_API_KEY"] = wandb_config.get("api_key", "")
        wandb.init(
            entity=wandb_config.get("entity"),
            project=wandb_config.get("project_name"),
            name=experiment_name,
        )
        self._wandb = wandb
        self.is_initialized = True
        self.log_freq = wandb_config.get("log_freq", 100)

    def log(self, log_dict: dict):
        if not self.is_initialized:
            return
        self._history.append(dict(log_dict))
        if getattr(self, "_wandb", None) is not None:
            self._wandb.log(log_dict)

    def get_log_freq(self) -> int:
        return self.log_freq if self.is_initialized else 100


wandb_logger = WandBLogger()
