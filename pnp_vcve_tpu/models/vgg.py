"""VGG feature extractor for the perceptual loss.

Reference surface: ``PerceptualVGG`` in
mmedit/models/losses/perceptual_loss.py:12-94 — a torchvision VGG
``features`` stack truncated at the deepest requested layer, with ImageNet
input normalization, features returned keyed by the torchvision layer INDEX
as a string (e.g. '34' = conv5_4 of vgg19).

Functional JAX design: the extractor is a pure function over a params dict
(``{'conv<idx>': {'kernel', 'bias'}}``); weights come from a one-off
torchvision-checkpoint conversion (:func:`convert_torchvision_vgg`) — this
environment has no network access, so a downloaded ``vgg19-*.pth`` is
converted at first use and cached by the caller. Random-init params
(:func:`init_vgg_params`) keep the plumbing testable without the asset.

Layout: NHWC, [0, 1] float inputs.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "VGG_CONFIGS",
    "vgg_features",
    "init_vgg_params",
    "convert_torchvision_vgg",
]

# torchvision `features` module sequences: channel count per conv, 'M' = pool.
VGG_CONFIGS = {
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}

# ImageNet statistics (perceptual_loss.py:53-60)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _layer_table(vgg_type: str):
    """[(torchvision_index, kind, channels)] for conv/relu/pool layers."""
    table = []
    idx = 0
    for v in VGG_CONFIGS[vgg_type]:
        if v == "M":
            table.append((idx, "pool", None))
            idx += 1
        else:
            table.append((idx, "conv", v))
            idx += 1
            table.append((idx, "relu", None))
            idx += 1
    return table


def init_vgg_params(rng, vgg_type: str = "vgg19", max_index: int | None = None):
    """He-normal random params (for tests / plumbing without the asset)."""
    params = {}
    cin = 3
    for idx, kind, cout in _layer_table(vgg_type):
        if max_index is not None and idx > max_index:
            break
        if kind != "conv":
            continue
        rng, k1 = jax.random.split(rng)
        params[f"conv{idx}"] = {
            "kernel": jax.nn.initializers.he_normal()(k1, (3, 3, cin, cout)),
            "bias": jnp.zeros((cout,)),
        }
        cin = cout
    return params


def convert_torchvision_vgg(state_dict, vgg_type: str = "vgg19") -> Dict:
    """torchvision ``vgg*.pth`` state dict -> our params (OIHW -> HWIO)."""
    params = {}
    for key, value in state_dict.items():
        # keys look like 'features.0.weight'
        if not key.startswith("features."):
            continue
        _, idx, leaf = key.split(".")
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        entry = params.setdefault(f"conv{idx}", {})
        if leaf == "weight":
            entry["kernel"] = jnp.asarray(arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            entry["bias"] = jnp.asarray(arr)
    return params


def vgg_features(
    params: Dict,
    x: jnp.ndarray,
    layer_names: Sequence[str],
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Features of ``x`` (b, h, w, 3) in [0, 1] at the requested torchvision
    layer indices (stringly keyed, like the reference)."""
    wanted = set(layer_names)
    max_index = max(int(n) for n in wanted)
    if use_input_norm:
        x = (x - _MEAN) / _STD
    out = {}
    for idx, kind, _ in _layer_table(vgg_type):
        if idx > max_index and not wanted:
            break
        if kind == "conv":
            p = params[f"conv{idx}"]
            x = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + p["bias"].astype(x.dtype)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:  # 2x2 max pool, stride 2
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        name = str(idx)
        if name in wanted:
            out[name] = x
            wanted.discard(name)
            if not wanted:
                break
    return out
