"""Pure-torch stand-in for the slice of mmcv-full 1.x the reference uses.

The reference repo (a fork of mmediting v0.14) imports from mmcv:
``ConvModule``/init helpers (mmcv.cnn), ``Registry`` (mmcv.utils),
``load_checkpoint`` (mmcv.runner), and the CUDA deformable convs
(mmcv.ops) — see SURVEY.md §2.4. This module recreates exactly that
surface in plain torch so the reference model files run on CPU as parity
oracles. Module/parameter naming matches mmcv (``.conv``, ``.bn``,
``.activate``, DCN ``.weight``/``.bias``) so ``state_dict()`` keys are
byte-identical to a real mmcv install.

Install with :func:`install` BEFORE importing anything from ``mmedit``.
"""

from __future__ import annotations

import logging
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# mmcv.utils


class Registry:
    """Name -> class map with mmcv's decorator API (mmcv/utils/registry.py)."""

    def __init__(self, name, parent=None, scope=None, build_func=None):
        self.name = name
        self._module_dict = {}
        self.parent = parent

    @property
    def module_dict(self):
        return self._module_dict

    def get(self, key):
        got = self._module_dict.get(key)
        if got is None and self.parent is not None:
            return self.parent.get(key)
        return got

    def _register(self, module, name=None, force=False):
        for n in [name] if isinstance(name, (str, type(None))) else name:
            key = n or module.__name__
            if not force and key in self._module_dict:
                raise KeyError(f"{key} already registered in {self.name}")
            self._module_dict[key] = module

    def register_module(self, name=None, force=False, module=None):
        # Supports: @reg.register_module(), @reg.register_module(name='X'),
        # reg.register_module('X', module=cls), and (legacy) bare-class arg.
        if module is not None:
            self._register(module, name=name, force=force)
            return module
        if isinstance(name, type):  # used as @reg.register_module w/o parens
            self._register(name, force=force)
            return name

        def _decorator(cls):
            self._register(cls, name=name, force=force)
            return cls

        return _decorator


def build_from_cfg(cfg, registry, default_args=None):
    args = dict(cfg)
    obj_type = args.pop("type")
    cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    if cls is None:
        raise KeyError(f"{obj_type} is not registered in {registry.name}")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return cls(**args)


def digit_version(version_str):
    out = []
    for x in version_str.split("."):
        if x.isdigit():
            out.append(int(x))
        elif "rc" in x:
            major, minor = x.split("rc")
            out.append(int(major) - 1)
            out.append(int(minor))
    return out


def get_logger(name, log_file=None, log_level=logging.INFO, file_mode="w"):
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    if logger is None:
        print(msg)
    elif logger != "silent":
        (logger if isinstance(logger, logging.Logger) else get_logger(str(logger))).log(level, msg)


def get_git_hash(digits=None):
    return "unknown"


def collect_env():
    return {"shim": "tests/oracle/mmcv_shim.py", "PyTorch": torch.__version__}


# ---------------------------------------------------------------------------
# mmcv.cnn


def constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def xavier_init(module, gain=1, bias=0, distribution="normal"):
    if hasattr(module, "weight") and module.weight is not None:
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu", bias=0, distribution="normal"):
    if hasattr(module, "weight") and module.weight is not None:
        if distribution == "uniform":
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode, nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode, nonlinearity=nonlinearity)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


_ACTIVATIONS = {
    "ReLU": nn.ReLU,
    "LeakyReLU": nn.LeakyReLU,
    "PReLU": nn.PReLU,
    "RReLU": nn.RReLU,
    "ReLU6": nn.ReLU6,
    "ELU": nn.ELU,
    "Sigmoid": nn.Sigmoid,
    "Tanh": nn.Tanh,
    "GELU": nn.GELU,
}


def build_activation_layer(cfg):
    cfg = dict(cfg)
    act_type = cfg.pop("type")
    cls = _ACTIVATIONS[act_type]
    if act_type in ("Sigmoid", "Tanh", "GELU", "PReLU"):
        cfg.pop("inplace", None)
    return cls(**cfg)


def build_norm_layer(cfg, num_features, postfix=""):
    cfg = dict(cfg)
    norm_type = cfg.pop("type")
    cfg.pop("requires_grad", None)
    if norm_type in ("BN", "BN2d", "SyncBN"):
        name, layer = "bn", nn.BatchNorm2d(num_features, **cfg)
    elif norm_type == "BN1d":
        name, layer = "bn", nn.BatchNorm1d(num_features, **cfg)
    elif norm_type == "BN3d":
        name, layer = "bn", nn.BatchNorm3d(num_features, **cfg)
    elif norm_type == "GN":
        name, layer = "gn", nn.GroupNorm(cfg.pop("num_groups"), num_features, **cfg)
    elif norm_type == "IN":
        name, layer = "in", nn.InstanceNorm2d(num_features, **cfg)
    elif norm_type == "LN":
        name, layer = "ln", nn.LayerNorm(num_features, **cfg)
    else:
        raise KeyError(f"norm type {norm_type}")
    return name + str(postfix), layer


_CONV_TYPES = {
    "Conv": nn.Conv2d,
    "Conv1d": nn.Conv1d,
    "Conv2d": nn.Conv2d,
    "Conv3d": nn.Conv3d,
    "Deconv": nn.ConvTranspose2d,
}


def build_conv_layer(cfg, *args, **kwargs):
    cfg = dict(cfg) if cfg else {"type": "Conv2d"}
    conv_type = cfg.pop("type")
    cls = _CONV_TYPES.get(conv_type) or CONV_LAYERS.get(conv_type)
    return cls(*args, **kwargs, **cfg)


class ConvModule(nn.Module):
    """conv + (norm) + (act), parameter names identical to mmcv's.

    Mirrors mmcv/cnn/bricks/conv_module.py: the conv lives at ``.conv``,
    the norm at ``.bn``/``.gn`` (via ``norm_name``), activation at
    ``.activate``; ``bias='auto'`` means bias iff no norm.
    """

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups=1,
        bias="auto",
        conv_cfg=None,
        norm_cfg=None,
        act_cfg=dict(type="ReLU"),
        inplace=True,
        with_spectral_norm=False,
        padding_mode="zeros",
        order=("conv", "norm", "act"),
    ):
        super().__init__()
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.order = tuple(order)

        conv_type = (conv_cfg or {}).get("type", "Conv2d")
        conv_cls = _CONV_TYPES[conv_type]
        extra = {k: v for k, v in (conv_cfg or {}).items() if k != "type"}
        if conv_type != "Deconv" and padding_mode != "zeros":
            extra["padding_mode"] = padding_mode
        self.conv = conv_cls(
            in_channels, out_channels, kernel_size,
            stride=stride, padding=padding, dilation=dilation,
            groups=groups, bias=bias, **extra,
        )
        if with_spectral_norm:
            self.conv = nn.utils.spectral_norm(self.conv)
        # expose conv attributes like mmcv does
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = self.conv.kernel_size
        self.stride = self.conv.stride
        self.padding = padding
        self.dilation = self.conv.dilation
        self.groups = groups

        if self.with_norm:
            norm_channels = out_channels if order.index("norm") > order.index("conv") else in_channels
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None

        if self.with_activation:
            act_cfg_ = dict(act_cfg)
            if act_cfg_["type"] not in ("Tanh", "PReLU", "Sigmoid", "GELU"):
                act_cfg_.setdefault("inplace", inplace)
            self.activate = build_activation_layer(act_cfg_)

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.norm_name else None

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = self.norm(x)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    """mmcv/cnn/bricks/depthwise_separable_conv_module.py equivalent."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        norm_cfg=None,
        act_cfg=dict(type="ReLU"),
        dw_norm_cfg="default",
        dw_act_cfg="default",
        pw_norm_cfg="default",
        pw_act_cfg="default",
        **kwargs,
    ):
        super().__init__()
        dw_norm_cfg = dw_norm_cfg if dw_norm_cfg != "default" else norm_cfg
        dw_act_cfg = dw_act_cfg if dw_act_cfg != "default" else act_cfg
        pw_norm_cfg = pw_norm_cfg if pw_norm_cfg != "default" else norm_cfg
        pw_act_cfg = pw_act_cfg if pw_act_cfg != "default" else act_cfg
        self.depthwise_conv = ConvModule(
            in_channels, in_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=in_channels,
            norm_cfg=dw_norm_cfg, act_cfg=dw_act_cfg, **kwargs,
        )
        self.pointwise_conv = ConvModule(
            in_channels, out_channels, 1, norm_cfg=pw_norm_cfg,
            act_cfg=pw_act_cfg, **kwargs,
        )

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class Scale(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float))

    def forward(self, x):
        return x * self.scale


# ---------------------------------------------------------------------------
# mmcv.ops — pure-torch DCN matching the CUDA kernels' offset/mask layout:
# offset channels interleave (dy, dx) per kernel tap within each deform
# group; bilinear sampling zero-pads outside (mmcv/ops/modulated_deform_conv.py).


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def modulated_deform_conv2d(
    x, offset, mask, weight, bias=None,
    stride=1, padding=0, dilation=1, groups=1, deform_groups=1,
):
    n, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    sy, sx = _pair(stride)
    ph, pw = _pair(padding)
    dy, dx = _pair(dilation)
    h_out = (h + 2 * ph - dy * (kh - 1) - 1) // sy + 1
    w_out = (w + 2 * pw - dx * (kw - 1) - 1) // sx + 1

    offset = offset.view(n, deform_groups, kh * kw, 2, h_out, w_out)
    if mask is None:
        mask = offset.new_ones(n, deform_groups, kh * kw, h_out, w_out)
    else:
        mask = mask.view(n, deform_groups, kh * kw, h_out, w_out)
    xg = x.view(n * deform_groups, cin // deform_groups, h, w)

    base_y = torch.arange(h_out, dtype=x.dtype, device=x.device) * sy - ph
    base_x = torch.arange(w_out, dtype=x.dtype, device=x.device) * sx - pw

    out = x.new_zeros(n, cout, h_out, w_out)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        off = offset[:, :, k]  # (n, dg, 2, h_out, w_out)
        py = base_y.view(1, 1, -1, 1) + ky * dy + off[:, :, 0]
        px = base_x.view(1, 1, 1, -1) + kx * dx + off[:, :, 1]
        gy = 2 * py / (h - 1) - 1 if h > 1 else torch.zeros_like(py)
        gx = 2 * px / (w - 1) - 1 if w > 1 else torch.zeros_like(px)
        grid = torch.stack([gx, gy], dim=-1).view(n * deform_groups, h_out, w_out, 2)
        s = F.grid_sample(xg, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        s = s * mask[:, :, k].reshape(n * deform_groups, 1, h_out, w_out)
        s = s.view(n, cin, h_out, w_out)
        wk = weight[:, :, ky, kx]  # (cout, cin/groups)
        if groups == 1:
            out = out + torch.einsum("oc,nchw->nohw", wk, s)
        else:
            s = s.view(n, groups, cin // groups, h_out, w_out)
            wkg = wk.view(groups, cout // groups, cin // groups)
            out = out + torch.einsum("goc,ngchw->ngohw", wkg, s).reshape(n, cout, h_out, w_out)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1, groups=1, deform_groups=1):
    return modulated_deform_conv2d(
        x, offset, None, weight, None, stride, padding, dilation, groups, deform_groups
    )


class ModulatedDeformConv2d(nn.Module):
    def __init__(
        self, in_channels, out_channels, kernel_size, stride=1, padding=0,
        dilation=1, groups=1, deform_groups=1, bias=True,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.with_bias = bias
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *self.kernel_size)
        )
        if bias:
            self.bias = nn.Parameter(torch.empty(out_channels))
        else:
            self.register_parameter("bias", None)
        self.init_weights()

    def init_weights(self):
        n = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        self.weight.data.uniform_(-(n ** -0.5), n ** -0.5)
        if self.bias is not None:
            self.bias.data.zero_()

    def forward(self, x, offset, mask):
        return modulated_deform_conv2d(
            x, offset, mask, self.weight, self.bias, self.stride,
            self.padding, self.dilation, self.groups, self.deform_groups,
        )


class ModulatedDeformConv2dPack(ModulatedDeformConv2d):
    """DCNv2 with its own offset/mask conv (mmcv's `DCNv2` / `DCN` alias)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.conv_offset = nn.Conv2d(
            self.in_channels, self.deform_groups * 3 * self.kernel_size[0] * self.kernel_size[1],
            kernel_size=self.kernel_size, stride=_pair(self.stride),
            padding=_pair(self.padding), dilation=_pair(self.dilation), bias=True,
        )
        constant_init(self.conv_offset, val=0, bias=0)

    def forward(self, x):
        out = self.conv_offset(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return modulated_deform_conv2d(
            x, offset, mask, self.weight, self.bias, self.stride,
            self.padding, self.dilation, self.groups, self.deform_groups,
        )


class DeformConv2d(nn.Module):
    """DCNv1 (no modulation), mmcv/ops/deform_conv.py module API (bias-free)."""

    def __init__(
        self, in_channels, out_channels, kernel_size, stride=1, padding=0,
        dilation=1, groups=1, deform_groups=1, bias=False,
    ):
        super().__init__()
        assert not bias, "mmcv DeformConv2d has no bias"
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels // groups, *self.kernel_size)
        )
        n = in_channels * self.kernel_size[0] * self.kernel_size[1]
        self.weight.data.uniform_(-(n ** -0.5), n ** -0.5)

    def forward(self, x, offset):
        return modulated_deform_conv2d(
            x, offset, None, self.weight, None, self.stride,
            self.padding, self.dilation, self.groups, self.deform_groups,
        )


def fused_bias_leakyrelu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    return F.leaky_relu(x + bias.view(1, -1, *([1] * (x.ndim - 2))), negative_slope) * scale


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    up = _pair(up)
    down = _pair(down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    n, c, h, w = x.shape
    out = x.reshape(n * c, 1, h, w)
    if up != (1, 1):
        z = out.new_zeros(n * c, 1, h * up[0], w * up[1])
        z[:, :, :: up[0], :: up[1]] = out
        out = z
    out = F.pad(out, [max(pad[0], 0), max(pad[1], 0), max(pad[2], 0), max(pad[3], 0)])
    out = out[
        :, :,
        max(-pad[2], 0): out.shape[2] - max(-pad[3], 0),
        max(-pad[0], 0): out.shape[3] - max(-pad[1], 0),
    ]
    k = torch.flip(kernel, [0, 1]).view(1, 1, *kernel.shape).to(out)
    out = F.conv2d(out, k)
    out = out[:, :, :: down[0], :: down[1]]
    return out.view(n, c, out.shape[2], out.shape[3])


# ---------------------------------------------------------------------------
# mmcv.runner


def load_checkpoint(model, filename, map_location=None, strict=False, logger=None):
    ckpt = torch.load(filename, map_location=map_location or "cpu")
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    model.load_state_dict(state_dict, strict=strict)
    return ckpt


def load_state_dict(module, state_dict, strict=False, logger=None):
    module.load_state_dict(state_dict, strict=strict)


# ---------------------------------------------------------------------------


def install():
    """Register the fake ``mmcv`` package tree in sys.modules (idempotent)."""
    if "mmcv" in sys.modules and getattr(sys.modules["mmcv"], "__shim__", False):
        return

    mmcv = types.ModuleType("mmcv")
    mmcv.__shim__ = True
    mmcv.__version__ = "1.5.0"

    utils = types.ModuleType("mmcv.utils")
    utils.Registry = Registry
    utils.build_from_cfg = build_from_cfg
    utils.digit_version = digit_version
    utils.get_logger = get_logger
    utils.print_log = print_log
    utils.get_git_hash = get_git_hash
    utils.collect_env = collect_env
    parrots = types.ModuleType("mmcv.utils.parrots_wrapper")
    parrots._BatchNorm = nn.modules.batchnorm._BatchNorm
    parrots._InstanceNorm = nn.modules.instancenorm._InstanceNorm
    utils.parrots_wrapper = parrots

    cnn = types.ModuleType("mmcv.cnn")
    global CONV_LAYERS
    CONV_LAYERS = Registry("conv layer")
    cnn.CONV_LAYERS = CONV_LAYERS
    cnn.MODELS = Registry("model")
    cnn.ConvModule = ConvModule
    cnn.DepthwiseSeparableConvModule = DepthwiseSeparableConvModule
    cnn.Scale = Scale
    cnn.build_activation_layer = build_activation_layer
    cnn.build_norm_layer = build_norm_layer
    cnn.build_conv_layer = build_conv_layer
    cnn.constant_init = constant_init
    cnn.kaiming_init = kaiming_init
    cnn.normal_init = normal_init
    cnn.xavier_init = xavier_init

    ops = types.ModuleType("mmcv.ops")
    ops.ModulatedDeformConv2d = ModulatedDeformConv2d
    ops.ModulatedDeformConv2dPack = ModulatedDeformConv2dPack
    ops.modulated_deform_conv2d = modulated_deform_conv2d
    ops.DeformConv2d = DeformConv2d
    ops.deform_conv2d = deform_conv2d
    ops.DCNv2 = ModulatedDeformConv2dPack
    ops.fused_bias_leakyrelu = fused_bias_leakyrelu
    ops.upfirdn2d = upfirdn2d

    runner = types.ModuleType("mmcv.runner")
    runner.load_checkpoint = load_checkpoint
    runner.load_state_dict = load_state_dict

    mmcv.utils = utils
    mmcv.cnn = cnn
    mmcv.ops = ops
    mmcv.runner = runner
    mmcv.Config = None  # only needed by tools/, never by model files

    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = utils
    sys.modules["mmcv.utils.parrots_wrapper"] = parrots
    sys.modules["mmcv.cnn"] = cnn
    sys.modules["mmcv.ops"] = ops
    sys.modules["mmcv.runner"] = runner


CONV_LAYERS = None  # populated by install()
