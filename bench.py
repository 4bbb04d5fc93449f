#!/usr/bin/env python
"""Headline benchmark: enhanced 720p frames/sec/chip on the flagship model.

Protocol: full flagship PnPVCVE (mid_channels=64, num_blocks=8, K=6) forward
over 1280x720 clips, bitstream-prior inputs resident in HBM, steady-state
wall time over the recurrence (the reference's probe is the per-clip
wall-time print at mmedit/models/restorers/basicvsr.py:176-182).

Prints ONE JSON line:
  {"metric": "720p_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R}

vs_baseline: the driver target is >5x the A100 PyTorch reference
(BASELINE.md). IMPORTANT: the denominator is an ESTIMATE, not a
measurement — the reference repo publishes no benchmark numbers
(BASELINE.json.published == {}), no A100 is reachable from this
environment, and the reference's only probe is a per-clip wall-time print
(mmedit/models/restorers/basicvsr.py:176-182).

Anchoring the 4.0 f/s estimate to citable per-model-class numbers
(detailed derivation in BASELINE.md "Denominator anchoring"):

  model class       published runtime        source (literature)
  ----------------  -----------------------  ----------------------------
  BasicVSR          63 ms / 720p out frame   Chan et al., CVPR'21, Tab.1
  IconVSR           70 ms / 720p out frame   Chan et al., CVPR'21, Tab.1
  BasicVSR++        77 ms / 720p out frame   Chan et al., CVPR'22, Tab.3
  EDVR-L            378 ms / 720p out frame  Wang et al., CVPRW'19

Those are x4-VSR nets whose recurrent blocks run at 180x320 LR (1/16 the
pixels of our same-size 720p protocol). Scaling BasicVSR's propagation
cost to the reference model's shape (8+8 DRT blocks at FULL 720p vs 30+30
plain blocks at LR; MoE + partition side paths add ~30% per block):
63 ms * (16/30 blocks) * 16x pixels * 1.3 ~= 700 ms/frame on the paper's
V100; / ~1.7 (A100 vs V100 fp32) ~= 410 ms => ~2.4 f/s for an idealized
torch implementation. The reference's actual forward adds a Python loop
over batch items with per-item torch.where/grid_sample calls per timestep
(iconvsr_ipb_par.py:71-147), so 4.0 f/s is a deliberately GENEROUS
(conservative-for-us) denominator. Replace with a measured number the
moment the released checkpoint can be timed on real hardware; relative
trends across rounds (BENCH_r*.json) are unaffected since the denominator
is constant.
"""

import json
import subprocess
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pnp_vcve_tpu.utils import apply_platform_override
if os.environ.get("PNP_BENCH_FLOPS_PROBE") != "1":
    apply_platform_override()
import jax
if os.environ.get("PNP_BENCH_FLOPS_PROBE") == "1":
    # flops-probe subprocess: HLO cost analysis needs the CPU backend
    # (axon's lowered.cost_analysis() returns None) and fully unrolled
    # scans (HLO while bodies are otherwise counted once, not per frame)
    jax.config.update("jax_platforms", "cpu")
    _orig_scan = jax.lax.scan

    def _unrolled_scan(f, init, xs=None, length=None, **kw):
        kw.pop("unroll", None)
        return _orig_scan(f, init, xs, length=length, unroll=True, **kw)

    jax.lax.scan = _unrolled_scan
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_FPS = 4.0


def _flops_probe():
    """Algorithmic FLOPs of ONE forward (whole clip), printed as JSON.

    Runs in a CPU subprocess; analyzes the XLA-equivalent forward
    (use_pallas_kernels=False, gather warp) so Pallas opacity and the pf
    warp's selection-matmul overcompute cannot distort the count.
    eval_shape params + ShapeDtypeStruct inputs: pure tracing, no compute.
    """
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = (int(os.environ[f"PNP_FP_{k}"]) for k in "BTHW")
    wi = os.environ["PNP_FP_WARP"]
    model = PnPVCVE(
        remat=False, feature_dtype=jnp.bfloat16, use_pallas_kernels=False,
        warp_impl="block8" if wi == "pf" else wi,
    )
    inputs = make_inputs(b, t, h, w, dtype=jnp.bfloat16)
    ish = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), inputs
    )
    psh = jax.eval_shape(model.init, jax.random.PRNGKey(0), **ish)
    ca = jax.jit(lambda p, i: model.apply(p, **i)).lower(psh, ish).cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(json.dumps({"flops": float(ca.get("flops", 0.0))}))


def make_inputs(b, t, h, w, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    slices = np.full((b, t), 66.0, np.float32)
    slices[:, ::4] = 80.0
    slices[:, 0] = 73.0
    # Realistic bitstream MVs: piecewise constant over 8x8 macroblock
    # partitions (what data/mv_raster.py emits), +-16 px search range.
    mvs_blk = (rng.standard_normal((b, t, h // 8, w // 8, 4)) * 6).astype(np.float32)
    mvs = np.repeat(np.repeat(mvs_blk, 8, axis=2), 8, axis=3)
    # partition one-hots constant per 8x8 block too
    par_blk = (rng.random((b, t, h // 8, w // 8, 3)) > 0.5).astype(np.float32)
    par = np.repeat(np.repeat(par_blk, 8, axis=2), 8, axis=3) / 255.0
    return dict(
        lrs=jnp.asarray(rng.random((b, t, h, w, 3)).astype(np.float32), dtype),
        qps=jnp.asarray(rng.random((b, t)).astype(np.float32)),
        slices=jnp.asarray(slices),
        mvs=jnp.asarray(mvs, dtype),
        base_qps=jnp.full((b, t), 15.0 / 255.0, jnp.float32),
        par_map=jnp.asarray(par, dtype),
    )


def main():
    from pnp_vcve_tpu.models import PnPVCVE

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    # 720p, window sized to fit one chip's HBM feature buffer.
    # PNP_BENCH_BATCH=2 (throughput serving) measures 20.24 f/s/chip
    # aggregate vs 20.14 at b=1 (round 4, PF-resident pipeline) — it fits
    # HBM because the fused Pallas reconstruction head keeps the scan xs
    # out of padded XLA-conv layouts (models/pnp_vcve.py head gate). The
    # DEFAULT stays b=1: +0.5% aggregate throughput does not buy 2x the
    # per-clip latency, and b=1 is also the reference eval protocol.
    # (Compile cost is no longer the reason — the persistent compile
    # cache, commit 09881bc, cut the b=2 recompile from ~75 to ~5.5 min.)
    b = int(os.environ.get("PNP_BENCH_BATCH", "1"))
    t, h, w = 12, 720, 1280
    if not on_tpu:  # CPU smoke fallback
        b, t, h, w = 1, 4, 128, 128

    # The fused Pallas DRT kernel (numerically identical, 2.9x the XLA
    # composition per block after the grid-alignment fix) is on by default;
    # PNP_BENCH_PALLAS=0 falls back to the pure-XLA path.
    use_pallas = os.environ.get("PNP_BENCH_PALLAS", "1") != "0" and on_tpu
    # block8 exploits the rasterizer's 8x8-block-constant MV structure
    # (exact on rasterized full-frame inputs); PNP_BENCH_BLOCK_WARP=0 falls
    # back to the generic per-pixel gather. PNP_BENCH_WARP overrides the
    # implementation outright: 'pf' = the PF-resident banded Pallas warp
    # (kernels/warp_pf.py; additionally bounds |MV| <= 16, the H.264
    # search range — the smoke clamps its MVs so the oracle agrees).
    warp_impl = os.environ.get("PNP_BENCH_WARP", "")
    if not warp_impl or not on_tpu:
        # default = 'pf' (measured 16.60 f/s vs 13.88 block8, r3): the
        # serving contract (block-constant MVs, |MV| <= 16) matches the
        # rasterizer-shaped bench inputs; the in-run smoke below verifies
        # it against the XLA block8 oracle on every bench run.
        warp_impl = (
            "pf"
            if os.environ.get("PNP_BENCH_BLOCK_WARP", "1") != "0" and on_tpu
            else "padgather"
        )
    model = PnPVCVE(
        remat=False, feature_dtype=jnp.bfloat16, use_pallas_kernels=use_pallas,
        warp_impl=warp_impl,
    )
    inputs = make_inputs(b, t, h, w, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    # Mosaic-compile smoke (runs BEFORE the timed loop): the fused Pallas
    # path at flagship channel widths on a tiny spatial shape must match
    # the XLA composition on the real TPU — kernel tests run in interpret
    # mode (tests/test_kernels.py), so Mosaic lowering regressions would
    # otherwise surface only as silent numerics here.
    smoke_err = None
    if on_tpu and use_pallas:
        s_in = make_inputs(1, 2, 32, 32, dtype=jnp.float32)
        if warp_impl == "pf":
            # pf bounds |MV| <= 16 (H.264 search range); clamp so the
            # block8 oracle agrees exactly
            s_in["mvs"] = jnp.clip(s_in["mvs"], -16.0, 16.0)
        kw = dict(remat=False, feature_dtype=jnp.float32)
        # the XLA oracle side has no 'pf' (PF layouts are Pallas-only);
        # block8 is numerically identical on these block-constant MVs
        ref_wi = "block8" if warp_impl == "pf" else warp_impl
        ref_m = PnPVCVE(**kw, use_pallas_kernels=False, warp_impl=ref_wi)
        pal_m = PnPVCVE(**kw, use_pallas_kernels=True, warp_impl=warp_impl)
        s_params = ref_m.init(jax.random.PRNGKey(1), **s_in)
        want = np.asarray(jax.jit(ref_m.apply)(s_params, **s_in), np.float32)
        got = np.asarray(jax.jit(pal_m.apply)(s_params, **s_in), np.float32)
        smoke_err = float(np.abs(got - want).max())
        if not smoke_err < 3e-3:
            print(json.dumps({
                "metric": "720p_frames_per_sec_per_chip", "value": 0.0,
                "unit": "frames/s", "vs_baseline": 0.0,
                "error": f"pallas smoke failed: max|diff|={smoke_err}",
            }))
            return

    # Timing methodology: K forwards chained on their own outputs inside ONE
    # jit, a single scalar read back at the end. Per-call wall probes through
    # the device tunnel proved untrustworthy (block_until_ready returned
    # early); a data-dependent chain with host readback cannot lie.
    n_iters = 4 if on_tpu else 2

    def chained(p, i):
        def body(_, lrs):
            return model.apply(p, **dict(i, lrs=lrs)).astype(i["lrs"].dtype)

        final = jax.lax.fori_loop(0, n_iters, body, i["lrs"])
        return jnp.sum(final.astype(jnp.float32))

    fwd = jax.jit(chained)
    float(fwd(params, inputs))  # compile + warmup

    t0 = time.perf_counter()
    float(fwd(params, inputs))
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_sec = b * t / dt
    record = {
        "metric": "720p_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / A100_REFERENCE_FPS, 3),
    }
    if smoke_err is not None:
        record["pallas_smoke_max_abs_err"] = round(smoke_err, 6)

    # Achieved TFLOP/s + MFU: the estimate-free single-chip numbers (the
    # vs_baseline denominator is an estimate; MFU is not). FLOPs come from
    # XLA's own HLO cost analysis (same source as tools/get_flops.py) of
    # the XLA-equivalent forward — the ALGORITHMIC flops of one clip
    # (see _flops_probe; a CPU subprocess because axon's
    # lowered.cost_analysis() returns None, with scans unrolled because
    # HLO while bodies are otherwise counted once, not per frame).
    try:
        env = dict(
            os.environ, PNP_BENCH_FLOPS_PROBE="1", PNP_FP_B=str(b),
            PNP_FP_T=str(t), PNP_FP_H=str(h), PNP_FP_W=str(w),
            PNP_FP_WARP=warp_impl,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1200,
        )
        flops = float(
            json.loads(out.stdout.strip().splitlines()[-1])["flops"]
        )
    except Exception:
        flops = 0.0
    if flops > 0:
        achieved = flops / dt / 1e12
        record["achieved_tflops_per_sec"] = round(achieved, 2)
        kind = jax.devices()[0].device_kind
        peaks = {  # dense bf16 peak TFLOP/s per chip (public specs)
            "v4": 275.0, "v5 lite": 197.0, "v5litepod": 197.0,
            "v5e": 197.0, "v5p": 459.0, "v5": 459.0,
            "v6 lite": 918.0, "v6e": 918.0,
        }
        peak = next(
            (v for k, v in peaks.items() if k in kind.lower()), None
        )
        if peak:
            record["mfu"] = round(achieved / peak, 4)
            record["device_kind"] = kind
    print(json.dumps(record))


if __name__ == "__main__":
    if os.environ.get("PNP_BENCH_FLOPS_PROBE") == "1":
        _flops_probe()
    else:
        main()
