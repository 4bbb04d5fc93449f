#!/usr/bin/env python
"""A/B the warp's true wall cost: full flagship vs identity-warp variant.

The xplane trace attributes ~18-33 ms/frame to gather/pad/select/copy glue
around the block8 warp, but async copy-start durations overlap and can't
be summed. This probe times the whole chained forward twice — once stock,
once with ``ops.warp.flow_warp`` monkeypatched to identity — so the delta
IS the end-to-end cost of warp + its layout fallout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp

from bench import make_inputs


def timed(model_kwargs, label, identity_warp=False, key_select_off=False):
    import pnp_vcve_tpu.ops.warp as warp_mod
    from pnp_vcve_tpu.models import PnPVCVE
    import pnp_vcve_tpu.models.pnp_vcve as m

    orig_warp = warp_mod.flow_warp
    orig_where = jnp.where
    if identity_warp:
        m_warp = lambda x, flow, *a, **kw: x  # noqa: E731
        warp_mod.flow_warp = m_warp
        m.flow_warp = m_warp
    try:
        model = PnPVCVE(**model_kwargs)
        b, t, h, w = 1, 12, 720, 1280
        inputs = make_inputs(b, t, h, w, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), **inputs)
        n_iters = 4

        def chained(p, i):
            def body(_, lrs):
                return model.apply(p, **dict(i, lrs=lrs)).astype(i["lrs"].dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, n_iters, body, i["lrs"]).astype(jnp.float32)
            )

        fwd = jax.jit(chained)
        float(fwd(params, inputs))
        t0 = time.perf_counter()
        float(fwd(params, inputs))
        dt = (time.perf_counter() - t0) / n_iters
        fps = b * t / dt
        print(json.dumps({"variant": label, "frames_per_sec": round(fps, 3),
                          "ms_per_frame": round(1000 / fps, 2)}), flush=True)
        return fps
    finally:
        warp_mod.flow_warp = orig_warp
        m.flow_warp = orig_warp


def main():
    kw = dict(remat=False, feature_dtype=jnp.bfloat16, use_pallas_kernels=True,
              warp_impl="block8")
    timed(kw, "stock_block8")
    timed(kw, "identity_warp", identity_warp=True)
    kw2 = dict(kw, warp_impl="padgather")
    timed(kw2, "padgather")


if __name__ == "__main__":
    main()
