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


def timed(model_kwargs, label, identity_warp=False, key_select_off=False,
          pf_mode=None):
    """``pf_mode`` isolates the PF warp's cost structure:
      'identity'     — flow_warp_pf returns its input (no warp at all);
      'const_tables' — tables built once from a fixed flow and reused
                       (loop-hoisted by XLA: kernel+table-stream cost stays,
                       per-step table BUILD cost goes away)."""
    import pnp_vcve_tpu.ops.warp as warp_mod
    import pnp_vcve_tpu.kernels.warp_pf as wpf
    from pnp_vcve_tpu.models import PnPVCVE
    import pnp_vcve_tpu.models.pnp_vcve as m

    orig_warp = warp_mod.flow_warp
    orig_pf = wpf.flow_warp_pf
    orig_where = jnp.where
    if identity_warp:
        m_warp = lambda x, flow, *a, **kw: x  # noqa: E731
        warp_mod.flow_warp = m_warp
        m.flow_warp = m_warp
    if pf_mode == "identity":
        wpf.flow_warp_pf = lambda zpf, flow, h, w, tile=128: zpf
    elif pf_mode == "const_tables":
        import numpy as np

        cache = {}

        def const_pf(zpf, flow, h, w, tile=128):
            if (h, w) not in cache:
                f = jnp.asarray(
                    np.random.default_rng(0)
                    .standard_normal((1, h, w, 2)) * 6,
                    flow.dtype,
                )
                cache[(h, w)] = wpf.build_warp_tables(f, h, w, tile)
            s_same, s_x, vm = cache[(h, w)]
            return wpf.warp_pf(zpf, s_same, s_x, vm, h, w, tile)

        wpf.flow_warp_pf = const_pf
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
        wpf.flow_warp_pf = orig_pf


def main():
    if "--pf" in sys.argv:
        kw = dict(remat=False, feature_dtype=jnp.bfloat16,
                  use_pallas_kernels=True, warp_impl="pf")
        timed(kw, "stock_pf")
        timed(kw, "pf_const_tables", pf_mode="const_tables")
        timed(kw, "pf_identity", pf_mode="identity")
        return
    kw = dict(remat=False, feature_dtype=jnp.bfloat16, use_pallas_kernels=True,
              warp_impl="block8")
    timed(kw, "stock_block8")
    timed(kw, "identity_warp", identity_warp=True)
    kw2 = dict(kw, warp_impl="padgather")
    timed(kw2, "padgather")


if __name__ == "__main__":
    main()
