"""Mount /root/reference's ``mmedit`` as an importable package (read-only).

The real ``mmedit/__init__`` and the ``models``/``backbones`` package
inits import the entire zoo (restorers, mattors, datasets — some needing
``av``/mmcv pieces beyond the shim), so we register bare namespace
packages with the right ``__path__`` and import only leaf modules; their
relative imports (``from .basicvsr_net import ...``) resolve through the
namespace path. ``mmedit.models.common`` and ``mmedit.models.registry``
execute their real sources (they only need the mmcv shim);
``mmedit.utils`` is faked (its real init drags in setup_env/cv2 thread
clamping we don't want in tests).
"""

from __future__ import annotations

import importlib
import logging
import sys
import types

from . import mmcv_shim

REF_ROOT = "/root/reference"

_NAMESPACE_PKGS = [
    ("mmedit", f"{REF_ROOT}/mmedit"),
    ("mmedit.models", f"{REF_ROOT}/mmedit/models"),
    ("mmedit.models.backbones", f"{REF_ROOT}/mmedit/models/backbones"),
    (
        "mmedit.models.backbones.sr_backbones",
        f"{REF_ROOT}/mmedit/models/backbones/sr_backbones",
    ),
    (
        "mmedit.models.backbones.encoder_decoders",
        f"{REF_ROOT}/mmedit/models/backbones/encoder_decoders",
    ),
    (
        "mmedit.models.backbones.encoder_decoders.encoders",
        f"{REF_ROOT}/mmedit/models/backbones/encoder_decoders/encoders",
    ),
    (
        "mmedit.models.backbones.encoder_decoders.decoders",
        f"{REF_ROOT}/mmedit/models/backbones/encoder_decoders/decoders",
    ),
    (
        "mmedit.models.backbones.vfi_backbones",
        f"{REF_ROOT}/mmedit/models/backbones/vfi_backbones",
    ),
    ("mmedit.models.components", f"{REF_ROOT}/mmedit/models/components"),
    (
        "mmedit.models.components.discriminators",
        f"{REF_ROOT}/mmedit/models/components/discriminators",
    ),
    ("mmedit.models.losses", f"{REF_ROOT}/mmedit/models/losses"),
    ("mmedit.models.plug_and_play", f"{REF_ROOT}/mmedit/models/backbones/plug_and_play"),
]


def install():
    """Idempotently set up shim mmcv + namespace mmedit packages."""
    mmcv_shim.install()
    if "mmedit" in sys.modules and getattr(sys.modules["mmedit"], "__shim__", False):
        return

    for name, path in _NAMESPACE_PKGS:
        mod = types.ModuleType(name)
        mod.__shim__ = True
        mod.__path__ = [path]
        mod.__package__ = name
        sys.modules[name] = mod

    utils = types.ModuleType("mmedit.utils")
    utils.__shim__ = True
    utils.get_root_logger = lambda log_file=None, log_level=logging.INFO: logging.getLogger(
        "mmedit"
    )
    sys.modules["mmedit.utils"] = utils


def load_ref(module_name: str):
    """Import a reference module, e.g.
    ``load_ref('mmedit.models.backbones.sr_backbones.iconvsr_ipb_par')``."""
    install()
    return importlib.import_module(module_name)
