"""Restorer wrapper: generator + pixel loss + eval protocol.

Equivalent of the reference ``BasicVSR`` restorer + ``BasicRestorer`` base
(mmedit/models/restorers/basicvsr.py:14-233, basic_restorer.py:15-249): owns
the generator module, computes the pixel loss at train time, and at test
time runs the full-clip forward and the sequence PSNR/SSIM protocol
(per-frame metric on uint8-quantized images, mean over the clip —
basicvsr.py:119-153).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.metrics import psnr as psnr_fn
from pnp_vcve_tpu.metrics import ssim as ssim_fn
from pnp_vcve_tpu.metrics import tensor2img
from pnp_vcve_tpu.train.losses import charbonnier_loss, l1_loss, mse_loss

__all__ = ["Restorer", "ALLOWED_METRICS"]

ALLOWED_METRICS: Dict[str, Callable] = {"PSNR": psnr_fn, "SSIM": ssim_fn}

_LOSSES = {
    "CharbonnierLoss": charbonnier_loss,
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
}


@dataclass
class Restorer:
    """Generator + loss + metric protocol (config model dict equivalent)."""

    generator: object  # flax module
    pixel_loss: str = "CharbonnierLoss"
    loss_weight: float = 1.0
    test_cfg: dict = field(default_factory=lambda: {"metrics": ["PSNR", "SSIM"], "crop_border": 0})

    def loss_fn(self) -> Callable:
        base = _LOSSES[self.pixel_loss]

        def fn(pred, target):
            return base(pred, target, weight=self.loss_weight)

        return fn

    def evaluate_clip(
        self, output: np.ndarray, gt: np.ndarray
    ) -> Dict[str, float]:
        """Per-frame metrics averaged over the clip (basicvsr.py:119-153).

        Args:
          output, gt: (t, h, w, 3) float arrays in [0, 1].
        """
        crop_border = int(self.test_cfg.get("crop_border", 0))
        metrics = self.test_cfg.get("metrics", ["PSNR", "SSIM"])
        sums = {m: 0.0 for m in metrics}
        t = output.shape[0]
        for i in range(t):
            out_img = tensor2img(output[i])
            gt_img = tensor2img(gt[i])
            for m in metrics:
                sums[m] += ALLOWED_METRICS[m](out_img, gt_img, crop_border=crop_border)
        return {m: v / t for m, v in sums.items()}


def average_clip_metrics(per_clip: list[Dict[str, float]]) -> Dict[str, float]:
    """Dataset mean over clips (reference base_sr_dataset.py:61-93)."""
    if not per_clip:
        return {}
    keys = per_clip[0].keys()
    return {k: float(np.mean([c[k] for c in per_clip])) for k in keys}
