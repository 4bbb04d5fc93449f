"""Reference (torch) checkpoint converters for the baseline zoo.

Extends :mod:`core.convert` (flagship-generator converter) to the baseline
models so released .pth checkpoints drive the parity gate
(tools/parity_check.py). Reference module layouts:

- SPyNet: mmedit/models/backbones/sr_backbones/basicvsr_net.py:561-756
  (``basic_module.{i}.basic_module.{j}.conv``, i<6, j<5)
- STDF:   mmedit/models/backbones/sr_backbones/stdf.py:21-262
  (u-net ``stdf.*`` + quality-enhancement ``qenet.*``)
- BasicVSR++ PQF family: basicvsr_pp_v2.py:17-852 (feat_extract /
  deform_align.{branch} / backbone.{branch} / reconstruction / heads)

Layout transforms: torch conv OIHW -> HWIO; torch ConvTranspose2d
``(in, out, kh, kw)`` -> flax ConvTranspose ``(kh, kw, in, out)`` with a
spatial 180-degree flip (verified numerically against
torch.nn.functional.conv_transpose2d); Linear -> transpose.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

__all__ = [
    "convert_spynet",
    "convert_stdf",
    "convert_bvpp_pqf",
    "assert_tree_matches",
]


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT(w):
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    spatially flipped (calibrated vs torch, see tests/test_convert.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _cb(sd, key, transform=_conv):
    """{kernel, bias} entry from '<key>.weight' / '<key>.bias'."""
    out = {"kernel": transform(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _strip(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^generator\.", "", k)
        if prefix and k.startswith(prefix):
            k = k[len(prefix):]
        out[k] = np.asarray(v)
    return out


def convert_spynet(sd: Mapping[str, np.ndarray], prefix: str = "") -> Dict:
    """``basic_module.{i}.basic_module.{j}.conv`` -> ``basic_module{i}/conv{j}``."""
    sd = _strip(sd, prefix)
    params: Dict = {}
    for i in range(6):
        mod = {}
        for j in range(5):
            mod[f"conv{j}"] = _cb(sd, f"basic_module.{i}.basic_module.{j}.conv")
        params[f"basic_module{i}"] = mod
    return params


def convert_stdf(sd: Mapping[str, np.ndarray], nb: int = 3, nb_qe: int = 6) -> Dict:
    """Reference STDFNet (stdf.py:200-262: ``stdf.*`` u-net + ``qenet.*``)."""
    sd = _strip(sd, "")
    stdf: Dict = {
        "in_conv": _cb(sd, "stdf.in_conv.0"),
        "out_conv": _cb(sd, "stdf.out_conv.0"),
        "offset_mask": _cb(sd, "stdf.offset_mask"),
        "deform_kernel": _conv(sd["stdf.deform_conv.weight"]),
        "deform_bias": np.asarray(sd["stdf.deform_conv.bias"]),
        # tr_conv Sequential: convs at 0, 2; ConvTranspose at 4
        "tr_conv_0": _cb(sd, "stdf.tr_conv.0"),
        "tr_conv_1": _cb(sd, "stdf.tr_conv.2"),
        "tr_conv_up": _cb(sd, "stdf.tr_conv.4", _convT),
    }
    for i in range(1, nb):
        stdf[f"dn_conv{i}_0"] = _cb(sd, f"stdf.dn_conv{i}.0")
        stdf[f"dn_conv{i}_1"] = _cb(sd, f"stdf.dn_conv{i}.2")
        stdf[f"up_conv{i}_0"] = _cb(sd, f"stdf.up_conv{i}.0")
        stdf[f"up_conv{i}_up"] = _cb(sd, f"stdf.up_conv{i}.2", _convT)
    qenet: Dict = {
        "in_conv": _cb(sd, "qenet.in_conv"),
        # hid_conv Sequential alternates ReLU/Conv (stdf.py:155-161): nb
        # convs at odd indices 1, 3, ..., 2*nb-1
        "out_conv": _cb(sd, "qenet.out_conv.1"),
    }
    for k in range(nb_qe):
        qenet[f"hid_conv{k}"] = _cb(sd, f"qenet.hid_conv.{2 * k + 1}")
    return {"stdf": stdf, "qenet": qenet}


def _res_blocks_with_input_conv(sd, prefix, num_blocks):
    """Reference ResidualBlocksWithInputConv (basicvsr_net.py:393-429):
    ``main.0`` input conv + ``main.2.{i}.conv{1,2}`` blocks."""
    tree = {"input_conv": _cb(sd, f"{prefix}.main.0")}
    for i in range(num_blocks):
        tree[f"block{i}_conv1"] = _cb(sd, f"{prefix}.main.2.{i}.conv1")
        tree[f"block{i}_conv2"] = _cb(sd, f"{prefix}.main.2.{i}.conv2")
    return tree


def convert_bvpp_pqf(
    sd: Mapping[str, np.ndarray], num_blocks: int = 7, extract_blocks: int = 5
) -> Dict:
    """BasicVSRPlusPlus_PQF family (basicvsr_pp_v2.py) -> our tree.

    All four variants share one parameter layout (they differ only in
    propagate() control flow), so this converts every family member.
    """
    sd = _strip(sd, "")
    params: Dict = {
        "feat_extract": _res_blocks_with_input_conv(sd, "feat_extract", extract_blocks),
        "reconstruction": _res_blocks_with_input_conv(
            sd, "reconstruction", extract_blocks
        ),
        "spynet": convert_spynet(sd, prefix="spynet."),
        "conv_hr": _cb(sd, "conv_hr"),
        "conv_last": _cb(sd, "conv_last"),
        "upsample1_kernel": _conv(sd["upsample1.upsample_conv.weight"]),
        "upsample1_bias": np.asarray(sd["upsample1.upsample_conv.bias"]),
        "upsample2_kernel": _conv(sd["upsample2.upsample_conv.weight"]),
        "upsample2_bias": np.asarray(sd["upsample2.upsample_conv.bias"]),
    }
    for branch in ("backward_1", "forward_1", "backward_2", "forward_2"):
        align = {
            "weight": _conv(sd[f"deform_align.{branch}.weight"]),
            "bias": np.asarray(sd[f"deform_align.{branch}.bias"]),
        }
        # conv_offset Sequential convs at 0, 2, 4, 6 -> conv_offset{0..3}
        for our_i, ref_i in enumerate((0, 2, 4, 6)):
            align[f"conv_offset{our_i}"] = _cb(
                sd, f"deform_align.{branch}.conv_offset.{ref_i}"
            )
        params[branch] = {
            "deform_align": align,
            "backbone": _res_blocks_with_input_conv(
                sd, f"backbone.{branch}", num_blocks
            ),
        }
    return params


def assert_tree_matches(converted: Dict, template: Dict, path: str = ""):
    """Raise with a readable diff when the converted tree's structure or
    shapes differ from a model's init tree."""
    ck, tk = set(converted), set(template)
    if ck != tk:
        raise KeyError(
            f"at {path or '<root>'}: converted-only={sorted(ck - tk)}, "
            f"model-only={sorted(tk - ck)}"
        )
    for k in sorted(ck):
        c, t = converted[k], template[k]
        p = f"{path}/{k}" if path else k
        if isinstance(t, dict):
            assert_tree_matches(c, t, p)
        elif tuple(np.shape(c)) != tuple(np.shape(t)):
            raise ValueError(f"at {p}: shape {np.shape(c)} != model {np.shape(t)}")
