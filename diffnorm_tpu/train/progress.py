"""Progress sinks: log/json/tensorboard writers.

Capability parity with fairseq/logging/progress_bar.py (simple/json/tqdm
formats + TensorBoard/W&B sinks). TensorBoard uses torch's SummaryWriter
(torch-cpu is in the image); wandb is gated on availability.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class ProgressWriter:
    """Fans metric dicts out to the configured sinks."""

    def __init__(
        self,
        log_format: str = "simple",
        tensorboard_logdir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        tag: str = "train",
    ):
        self.log_format = log_format
        self.tag = tag
        self._tb = None
        self._wandb = None
        if tensorboard_logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(tensorboard_logdir, tag))
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard unavailable: %s", e)
        if wandb_project:
            try:
                import wandb

                wandb.init(project=wandb_project, reinit=False)
                self._wandb = wandb
            except Exception as e:  # pragma: no cover
                logger.warning("wandb unavailable: %s", e)

    def log(self, metrics: Dict[str, float], step: int, prefix: str = ""):
        if self.log_format == "json":
            payload = {"step": step, **{f"{prefix}{k}": v for k, v in metrics.items()}}
            print(json.dumps(payload), file=sys.stdout, flush=True)
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"{prefix}{k}", v, step)
        if self._wandb is not None:
            self._wandb.log(
                {f"{prefix}{k}": v for k, v in metrics.items()}, step=step
            )

    def close(self):
        if self._tb is not None:
            self._tb.close()
