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

__all__ = ["Restorer", "CenterFrameRestorer", "ALLOWED_METRICS", "evaluate_center_frame_dataset"]

def _niqe_metric(out_img, gt_img, crop_border: int = 0):
    """No-reference NIQE; gt is ignored (metrics.py:521-572)."""
    from pnp_vcve_tpu.metrics import niqe as niqe_fn

    return niqe_fn(out_img, crop_border=crop_border)


def _l1_metric(out_img, gt_img, crop_border: int = 0):
    from pnp_vcve_tpu.metrics import l1_evaluation

    return l1_evaluation(out_img, gt_img, crop_border=crop_border)


def _mae_metric(out_img, gt_img, crop_border: int = 0):
    from pnp_vcve_tpu.metrics import mae as mae_fn

    return mae_fn(out_img, gt_img, crop_border=crop_border)


ALLOWED_METRICS: Dict[str, Callable] = {
    "PSNR": psnr_fn,
    "SSIM": ssim_fn,
    "MAE": _mae_metric,
    "L1Evaluation": _l1_metric,
    "NIQE": _niqe_metric,
}

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


@dataclass
class CenterFrameRestorer(Restorer):
    """Restorer for window->center-frame models (STDF / MFQEv2 / DCNGAN;
    reference restorers/stdf.py:13-120, mfqev2_restorer.py:14-140).

    The generator consumes a (b, t, h, w, c) window and emits the enhanced
    center frame (b, h, w, c); metrics run per center frame.
    """

    def evaluate_frame(self, output: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
        crop_border = int(self.test_cfg.get("crop_border", 0))
        metrics = self.test_cfg.get("metrics", ["PSNR", "SSIM"])
        out_img = tensor2img(output)
        gt_img = tensor2img(gt)
        return {
            m: ALLOWED_METRICS[m](out_img, gt_img, crop_border=crop_border)
            for m in metrics
        }


def evaluate_center_frame_dataset(
    restorer: CenterFrameRestorer,
    params,
    samples,
    apply_kwargs: Optional[dict] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Iterate (lq window, gt center) samples (e.g. LDPTripleDataset
    .iter_test) and average the per-frame metrics."""
    import jax

    apply_kwargs = apply_kwargs or {}

    @jax.jit
    def step(p, lq, base_qps):
        return restorer.generator.apply(
            {"params": p}, lq, base_qps=base_qps, **apply_kwargs
        )

    per_frame = []
    for s in samples:
        out = step(params, jnp.asarray(s["lq"][None]), jnp.asarray(s["base_qps"][None]))
        m = restorer.evaluate_frame(np.asarray(out[0]), s["gt"][0])
        per_frame.append(m)
        if verbose:
            name = s.get("clip_name", str(len(per_frame)))
            print(f"[eval] {name}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
    return average_clip_metrics(per_frame)
