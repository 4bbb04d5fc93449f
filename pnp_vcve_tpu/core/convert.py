"""Reference (torch) checkpoint -> param pytree converter.

Maps the reference ``BasicVSR`` checkpoint's ``generator.*`` state-dict
entries onto our flax param tree. Name map (reference classes in
parentheses):

==============================================================  =========================
reference state-dict key                                        ours
==============================================================  =========================
BasePredictor.BaseNet.{0,2}.{weight,bias}   (Base_Predictor)    base_predictor/fc{0,1}
BiasePredictor.fc.{0,2}.weight              (SEModule)          bias_predictor/fc{0,1}
BiasePredictor.{qf_embed,to_gamma,to_beta}.0.*  (Bias_Predictor) bias_predictor/*
{backward,forward}_resblocks.input_conv.0.*                     {b,f}/resblocks/input_conv_*
{b,f}_resblocks.main.{i}.conv2.{weight,bias} (Dynamic_conv2d)   block{i}/conv2/{bank,bias_bank}
{b,f}_resblocks.main.{i}.conv1.*             (one_layer Conv2d)  block{i}/conv1_{kernel,bias}
{b,f}_resblocks.main.{i}.conv{16x16,16x8,8x8}.weight            block{i}/par_kernel[:, r, :]
conv_hr.* conv_last.*                                           forward/conv_{hr,last}_*
upsample{1,2}.upsample_conv.*               (PixelShufflePack)  forward/upsample{1,2}_*
==============================================================  =========================

Layout transforms:
- torch Linear ``(out, in)`` -> flax Dense ``(in, out)``: transpose.
- torch Conv2d OIHW ``(out, in, kh, kw)`` -> HWIO: transpose(2, 3, 1, 0).
- expert bank ``(K, out, in, kh, kw)`` -> ``(K, kh, kw, in, out)``:
  transpose(0, 3, 4, 2, 1).
- 1x1 partition convs ``(out, in, 1, 1)`` x3 -> stacked ``(in, 3, out)``.
- PixelShufflePack conv output channels are ordered ``(c, r^2)`` in torch's
  pixel_shuffle convention, which our ``ops.pixel_shuffle`` replicates — no
  channel permutation needed.

Scope: the flagship generator (one_layer=True, with_se=True, blocktype=drt).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

__all__ = ["convert_generator_state_dict"]


def _dense(w, b=None):
    out = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bank(w):
    return np.ascontiguousarray(np.transpose(w, (0, 3, 4, 2, 1)))


def convert_generator_state_dict(
    sd: Mapping[str, np.ndarray],
    num_blocks: int = 8,
    vsr: bool = False,
    strict: bool = True,
) -> Dict:
    """Convert reference generator weights to our param tree.

    Args:
      sd: state dict of numpy arrays; keys may carry a ``generator.`` prefix
        (a full restorer checkpoint) or not (a bare generator).
    """
    sd = {re.sub(r"^generator\.", "", k): np.asarray(v) for k, v in sd.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    params: Dict = {}

    params["base_predictor"] = {
        "fc0": _dense(take("BasePredictor.BaseNet.0.weight"), take("BasePredictor.BaseNet.0.bias")),
        "fc1": _dense(take("BasePredictor.BaseNet.2.weight"), take("BasePredictor.BaseNet.2.bias")),
    }

    if "BiasePredictor.fc.0.weight" in sd:  # SEModule (with_se=True)
        params["bias_predictor"] = {
            "fc0": _dense(take("BiasePredictor.fc.0.weight")),
            "fc1": _dense(take("BiasePredictor.fc.2.weight")),
        }
    elif "BiasePredictor.qf_embed.0.weight" in sd:  # Bias_Predictor
        params["bias_predictor"] = {
            "qf_embed": _dense(take("BiasePredictor.qf_embed.0.weight"), take("BiasePredictor.qf_embed.0.bias")),
            "to_gamma": _dense(take("BiasePredictor.to_gamma.0.weight"), take("BiasePredictor.to_gamma.0.bias")),
        }
        if "BiasePredictor.to_beta.0.weight" in sd:
            params["bias_predictor"]["to_beta"] = _dense(
                take("BiasePredictor.to_beta.0.weight"), take("BiasePredictor.to_beta.0.bias")
            )

    for side in ("backward", "forward"):
        pre = f"{side}_resblocks"
        tree = {
            "input_conv_kernel": _conv(take(f"{pre}.input_conv.0.weight")),
            "input_conv_bias": take(f"{pre}.input_conv.0.bias"),
        }
        for i in range(num_blocks):
            blk = {}
            blk["conv2"] = {
                "bank": _bank(take(f"{pre}.main.{i}.conv2.weight")),
                "bias_bank": take(f"{pre}.main.{i}.conv2.bias"),
            }
            c1w = take(f"{pre}.main.{i}.conv1.weight")
            if c1w.ndim == 5:  # one_layer=False: dynamic conv1
                blk["conv1"] = {
                    "bank": _bank(c1w),
                    "bias_bank": take(f"{pre}.main.{i}.conv1.bias"),
                }
            else:
                blk["conv1_kernel"] = _conv(c1w)
                blk["conv1_bias"] = take(f"{pre}.main.{i}.conv1.bias")
            pk = [
                take(f"{pre}.main.{i}.conv16x16.weight"),
                take(f"{pre}.main.{i}.conv16x8.weight"),
                take(f"{pre}.main.{i}.conv8x8.weight"),
            ]
            # (out, in, 1, 1) -> (in, out); stack on axis 1 -> (in, 3, out)
            blk["par_kernel"] = np.stack(
                [np.ascontiguousarray(w[:, :, 0, 0].T) for w in pk], axis=1
            )
            tree[f"block{i}"] = blk
        params[side] = {"resblocks": tree}

    if "deform_align.weight" in sd:
        # deform='basic'/'fvc' aligner (iconvsr_ipb.py:19-23). The reference
        # shares ONE module between sweeps; our flax scan scopes one per
        # sweep, so the same weights are written into both (models/
        # pnp_vcve.py _align docstring).
        da_src = {
            "weight": _conv(take("deform_align.weight")),
            "bias": take("deform_align.bias"),
            "conv_offset": {
                "conv0": {
                    "kernel": _conv(take("deform_align.conv_offset.0.weight")),
                    "bias": take("deform_align.conv_offset.0.bias"),
                },
                "conv1": {
                    "kernel": _conv(take("deform_align.conv_offset.2.weight")),
                    "bias": take("deform_align.conv_offset.2.bias"),
                },
            },
        }
        for side in ("backward", "forward"):
            params[side]["deform_align"] = {
                k: (dict(v) if isinstance(v, dict) else np.copy(v))
                for k, v in da_src.items()
            }

    fwd = params["forward"]
    fwd["conv_hr_kernel"] = _conv(take("conv_hr.weight"))
    fwd["conv_hr_bias"] = take("conv_hr.bias")
    fwd["conv_last_kernel"] = _conv(take("conv_last.weight"))
    fwd["conv_last_bias"] = take("conv_last.bias")
    if vsr:
        for up in ("upsample1", "upsample2"):
            fwd[f"{up}_kernel"] = _conv(take(f"{up}.upsample_conv.weight"))
            fwd[f"{up}_bias"] = take(f"{up}.upsample_conv.bias")

    if strict:
        ignorable = {k for k in sd if k.startswith(("spynet.", "edvr.", "step_counter"))}
        left = set(sd) - used - ignorable
        if left:
            raise KeyError(f"Unconverted reference keys: {sorted(left)[:10]}...")
    return params
