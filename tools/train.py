#!/usr/bin/env python
"""Training entrypoint (CLI contract of reference tools/train.py:21-72).

Single-process JAX runtime: the GPUS argument of dist_train.sh maps to the
local device mesh; multi-host runs call ``jax.distributed.initialize`` via
--multihost (coordinator env vars), after which the same mesh spans hosts.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description="Train a PnP-VCVE model (TPU)")
    p.add_argument("config", help="train config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--exp_name", type=str, default=None, help="experiment name")
    p.add_argument("--resume-from", help="checkpoint dir to resume from")
    p.add_argument("--load-from", dest="load_from", help="weights to init from")
    p.add_argument("--seed", type=int, default=None, help="random seed")
    p.add_argument(
        "--deterministic", action="store_true",
        help="accepted for CLI parity; JAX runs are deterministic by seed",
    )
    p.add_argument(
        "--cfg-options", nargs="+", default=[],
        help="override config entries: key.path=value",
    )
    p.add_argument("--total-iters", type=int, default=None, help="override total iters")
    p.add_argument("--multihost", action="store_true", help="init jax.distributed")
    # accepted for dist_train.sh contract compatibility
    p.add_argument("--launcher", default="none")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--autoscale-lr", action="store_true")
    return p.parse_args()


def _train_gan(cfg, generator, loader, mesh, total_iters, seed, start_iter, g_state):
    """Adversarial training loop (reference dcngan.py:81-228 recipe):
    per iter, D on real/fake, then G on pixel + adversarial (+ feature
    matching, + VGG perceptual when configured)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pnp_vcve_tpu.core.builder import build_discriminator, build_optimizer
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.gan import make_gan_train_step
    from pnp_vcve_tpu.train.loop import state_payload

    mdl = cfg.model
    disc = build_discriminator(dict(mdl["discriminator"]))

    # peek one batch for shapes
    it = iter(loader)
    first = next(it)
    t = first["lq"].shape[1]
    gt_center = first["gt"][:, t // 2]
    d_params = disc.init(jax.random.PRNGKey(seed + 1), jnp.zeros_like(gt_center))[
        "params"
    ]
    opt_cfgs = cfg.get("optimizers", {})
    d_tx = build_optimizer(
        {"generator": opt_cfgs.get("discriminator", opt_cfgs.get("generator"))},
        cfg.get("lr_config"),
        total_iters,
    )
    d_state = create_train_state(d_params, d_tx)

    perceptual = None
    pcfg = mdl.get("perceptual_loss")
    if pcfg is not None:
        from pnp_vcve_tpu.train.losses import make_perceptual_loss

        pretrained = pcfg.get("pretrained")
        vgg_params = None
        if pretrained and os.path.exists(str(pretrained)):
            import torch

            from pnp_vcve_tpu.models.vgg import convert_torchvision_vgg

            sd = torch.load(pretrained, map_location="cpu", weights_only=False)
            vgg_params = convert_torchvision_vgg(
                sd.get("state_dict", sd), pcfg.get("vgg_type", "vgg19")
            )
        else:
            print(
                f"[gan] perceptual_loss configured but pretrained VGG not "
                f"found at {pretrained!r}; SKIPPING the perceptual term"
            )
        if vgg_params is not None:
            perceptual = make_perceptual_loss(
                vgg_params,
                dict(pcfg.get("layer_weights", {"34": 1.0})),
                vgg_type=pcfg.get("vgg_type", "vgg19"),
                perceptual_weight=pcfg.get("perceptual_weight", 1.0),
                style_weight=pcfg.get("style_weight", 0.0),
                norm_img=pcfg.get("norm_img", False),
                criterion=pcfg.get("criterion", "l1"),
            )

    step_fn = make_gan_train_step(
        generator,
        disc,
        gan_type=mdl.get("gan_type", "lsgan"),
        pixel_weight=mdl.get("pixel_weight", 1.0),
        gan_weight=mdl.get("gan_weight", 0.01),
        fm_weight=mdl.get("fm_weight", 0.0),
        perceptual_loss=perceptual,
        donate=False,
    )

    ckpt = CheckpointManager(cfg.work_dir)
    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_int = cfg.get("checkpoint_config", {}).get("interval", 2000)
    losses_g, losses_d = [], []
    t_last = time.perf_counter()
    # dp-shard the GAN batches over the mesh like the main path (the
    # generator/discriminator states are replicated; gradients psum)
    from pnp_vcve_tpu.parallel.sharding import batch_sharding, replicated

    g_state = jax.device_put(g_state, replicated(mesh))
    d_state = jax.device_put(d_state, replicated(mesh))

    def shard_gan_batch(b_):
        return {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in b_.items()
        }

    batch = first
    for step in range(start_iter, total_iters):
        gan_batch = shard_gan_batch({
            "lq": batch["lq"],
            "gt": batch["gt"][:, t // 2],
            "base_qps": batch["base_qps"],
        })
        g_state, d_state, metrics = step_fn(g_state, d_state, gan_batch)
        losses_g.append(metrics["loss_g"])
        losses_d.append(metrics["loss_d"])
        if (step + 1) % log_int == 0:
            lg = float(np.mean(jax.device_get(losses_g)))
            ld = float(np.mean(jax.device_get(losses_d)))
            losses_g.clear()
            losses_d.clear()
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            print(
                f"iter {step + 1}/{total_iters} loss_g={lg:.5f} "
                f"loss_d={ld:.5f} ({log_int / dt:.2f} it/s)"
            )
        if (step + 1) % ckpt_int == 0 or step + 1 == total_iters:
            payload = state_payload(g_state)
            payload["disc"] = state_payload(d_state)
            ckpt.save(step + 1, payload, wait=step + 1 == total_iters)
        if step + 1 < total_iters:
            batch = next(it)
    ckpt.close()
    print("GAN training done")


def _train_cyclegan(cfg, total_iters, seed, start_iter=0, logger=print):
    """CycleGAN end-to-end training from the CLI (reference
    mmedit/models/synthesizers/cycle_gan.py:18-199): two direction
    generators + two domain discriminators on an unpaired dataset.

    Dispatched on ``cfg.model.type == 'CycleGAN'`` BEFORE the restorer
    path touches ``restorer.generator`` (which a CycleGAN container does
    not have)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_vcve_tpu.core.builder import (
        build_dataset,
        build_optimizer,
        build_restorer,
    )
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.gan import make_cyclegan_train_step

    container = build_restorer(cfg.model, cfg.get("test_cfg"))
    ds = build_dataset(dict(cfg.data["train"]))
    bsz = cfg.data.get("train_dataloader", {}).get("samples_per_gpu", 1)
    rng = np.random.default_rng(seed)

    def next_batch():
        samples = [ds.sample(rng) for _ in range(bsz)]
        return {
            "img_a": jnp.asarray(np.stack([s["img_a"] for s in samples])),
            "img_b": jnp.asarray(np.stack([s["img_b"] for s in samples])),
        }

    first = next_batch()
    key = jax.random.PRNGKey(seed)
    ka, kb, kda, kdb = jax.random.split(key, 4)
    pa = container.generator_a.init(ka, first["img_a"])["params"]
    pb = container.generator_b.init(kb, first["img_b"])["params"]
    da_p = container.disc_a.init(kda, first["img_a"])["params"]
    db_p = container.disc_b.init(kdb, first["img_b"])["params"]

    opt_cfgs = dict(cfg.get("optimizers", {}) or {})
    g_opt = opt_cfgs.get(
        "generators", opt_cfgs.get("generator", {"type": "Adam", "lr": 2e-4})
    )
    d_opt = opt_cfgs.get("discriminators", opt_cfgs.get("discriminator", g_opt))

    def mk_state(params, ocfg):
        tx = build_optimizer(
            {"generator": dict(ocfg)}, cfg.get("lr_config"), total_iters
        )
        return create_train_state(params, tx)

    ga, gb = mk_state(pa, g_opt), mk_state(pb, g_opt)
    da, db = mk_state(da_p, d_opt), mk_state(db_p, d_opt)

    step_fn = make_cyclegan_train_step(
        container.generator_a,
        container.generator_b,
        container.disc_a,
        container.disc_b,
        gan_type=container.gan_type,
        cycle_weight=container.cycle_weight,
        id_weight=container.id_weight,
        donate=False,
    )

    ckpt = CheckpointManager(cfg.work_dir)
    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_int = (cfg.get("checkpoint_config", {}) or {}).get("interval", 2000)
    t_last = time.perf_counter()
    batch = first
    for it in range(start_iter, total_iters):
        ga, gb, da, db, metrics = step_fn(ga, gb, da, db, batch)
        if (it + 1) % log_int == 0 or it + 1 == total_iters:
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            logger(
                f"[cyclegan] iter {it + 1}/{total_iters} "
                + " ".join(
                    f"{k}={float(jax.device_get(v)):.5f}"
                    for k, v in metrics.items()
                )
                + f" ({log_int / max(dt, 1e-9):.2f} it/s)"
            )
        if (ckpt_int and (it + 1) % ckpt_int == 0) or it + 1 == total_iters:
            ckpt.save(
                it + 1,
                {
                    "generator_a": ga.params,
                    "generator_b": gb.params,
                    "disc_a": da.params,
                    "disc_b": db.params,
                },
                wait=it + 1 == total_iters,
            )
        if it + 1 < total_iters:
            batch = next_batch()
    ckpt.close()
    logger("[cyclegan] training done")


_INPAINTOR_TYPES = (
    "GLInpaintor", "OneStageInpaintor", "DeepFillv1Inpaintor",
    "DeepFillv2Inpaintor", "TwoStageInpaintor", "AOTInpaintor",
    "PConvInpaintor",
)
_MATTOR_TYPES = ("DIM", "GCA", "IndexNet", "IndexNetMattor", "GCAMattor")


def _train_inpaintor(cfg, total_iters, seed, logger=print):
    """Inpainting end-to-end training from a reference-shaped config
    (reference mmedit/models/inpaintors/one_stage.py:24-445 /
    gl_inpaintor.py / two_stage.py): generator forward on masked input,
    hole/valid L1 (+ adversarial when a disc is configured)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pnp_vcve_tpu.core.builder import (
        build_dataset,
        build_discriminator,
        build_generator,
        build_optimizer,
    )
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.losses import gan_loss, masked_l1_loss

    mdl = cfg.model
    model_type = mdl.get("type")
    gen_cfg = dict(mdl.get("encdec") or mdl.get("generator"))
    gen = build_generator(gen_cfg)
    gen_type = gen_cfg.get("type", "")
    is_pconv = "PConv" in model_type or "PConv" in gen_type
    is_deepfill = "DeepFill" in gen_type or "DeepFill" in model_type or "TwoStage" in model_type

    disc_cfg = mdl.get("disc")
    # DeepFillv1Discriminators needs (global, local) pairs; the e2e CLI
    # path trains with the global image only, so use any single-input disc
    disc = build_discriminator(dict(disc_cfg)) if disc_cfg else None

    ds = build_dataset(dict(cfg.data["train"]))
    bsz = cfg.data.get("train_dataloader", {}).get("samples_per_gpu", 1)
    rng = np.random.default_rng(seed)

    def next_batch():
        samples = [ds.sample(rng) for _ in range(bsz)]
        stack = lambda k: jnp.asarray(np.stack([s[k] for s in samples]))
        return {"gt_img": stack("gt_img"), "mask": stack("mask"),
                "masked_img": stack("masked_img")}

    first = next_batch()

    def gen_forward(params, batch):
        mask = batch["mask"]
        if is_pconv:
            out, _ = gen.apply({"params": params}, batch["masked_img"], 1.0 - mask)
            return None, out
        if is_deepfill:
            ones = jnp.ones_like(mask)
            x = jnp.concatenate([batch["masked_img"], ones, mask], axis=-1)
            s1, s2 = gen.apply({"params": params}, x)[:2]
            return s1, s2
        x = jnp.concatenate([batch["masked_img"], mask], axis=-1)
        return None, gen.apply({"params": params}, x)

    key = jax.random.PRNGKey(seed)
    mask0 = first["mask"]
    if is_pconv:
        g_params = gen.init(key, first["masked_img"], 1.0 - mask0)["params"]
    elif is_deepfill:
        x0 = jnp.concatenate([first["masked_img"], jnp.ones_like(mask0), mask0], -1)
        g_params = gen.init(key, x0)["params"]
    else:
        x0 = jnp.concatenate([first["masked_img"], mask0], -1)
        g_params = gen.init(key, x0)["params"]
    d_params = (
        disc.init(jax.random.PRNGKey(seed + 1), first["gt_img"])["params"]
        if disc is not None else None
    )

    opt_cfgs = dict(cfg.get("optimizers", {}) or {})
    g_opt = opt_cfgs.get("generator", {"type": "Adam", "lr": 1e-4})
    d_opt = opt_cfgs.get("disc", opt_cfgs.get("discriminator", g_opt))
    mk = lambda p, oc: create_train_state(
        p, build_optimizer({"generator": dict(oc)}, cfg.get("lr_config"), total_iters)
    )
    g_state = mk(g_params, g_opt)
    d_state = mk(d_params, d_opt) if d_params is not None else None

    w_hole = (mdl.get("loss_l1_hole") or {}).get("loss_weight", 1.0)
    w_valid = (mdl.get("loss_l1_valid") or {}).get("loss_weight", 1.0)
    gan_cfg = mdl.get("loss_gan") or {}
    w_gan = gan_cfg.get("loss_weight", 0.001) if disc is not None else 0.0
    gan_type = gan_cfg.get("gan_type", "vanilla")

    @jax.jit
    def train_step(g_state, d_state, batch):
        mask, gt = batch["mask"], batch["gt_img"]

        def g_loss_fn(gp):
            s1, s2 = gen_forward(gp, batch)
            loss = masked_l1_loss(s2, gt, mask) * w_hole
            loss = loss + masked_l1_loss(s2, gt, 1.0 - mask) * w_valid
            if s1 is not None:
                loss = loss + masked_l1_loss(s1, gt, mask) * w_hole
                loss = loss + masked_l1_loss(s1, gt, 1.0 - mask) * w_valid
            comp = s2 * mask + gt * (1.0 - mask)
            if d_state is not None:
                pred = disc.apply({"params": d_state.params}, comp)
                pred = pred[0] if isinstance(pred, tuple) else pred
                loss = loss + gan_loss(pred, True, gan_type) * w_gan
            return loss, comp

        (g_l, comp), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params
        )
        g_state = g_state.apply_gradients(g_grads)
        metrics = {"loss_g": g_l}
        if d_state is not None:
            def d_loss_fn(dp):
                pr = disc.apply({"params": dp}, gt)
                pf = disc.apply({"params": dp}, jax.lax.stop_gradient(comp))
                pr = pr[0] if isinstance(pr, tuple) else pr
                pf = pf[0] if isinstance(pf, tuple) else pf
                return 0.5 * (
                    gan_loss(pr, True, gan_type) + gan_loss(pf, False, gan_type)
                )

            d_l, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
            d_state = d_state.apply_gradients(d_grads)
            metrics["loss_d"] = d_l
        return g_state, d_state, metrics

    ckpt = CheckpointManager(cfg.work_dir)
    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_int = (cfg.get("checkpoint_config", {}) or {}).get("interval", 2000)
    batch = first
    t_last = time.perf_counter()
    for it in range(total_iters):
        g_state, d_state, metrics = train_step(g_state, d_state, batch)
        if (it + 1) % log_int == 0 or it + 1 == total_iters:
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            logger(
                f"[inpaint:{model_type}] iter {it + 1}/{total_iters} "
                + " ".join(f"{k}={float(jax.device_get(v)):.5f}"
                           for k, v in metrics.items())
            )
        if (ckpt_int and (it + 1) % ckpt_int == 0) or it + 1 == total_iters:
            payload = {"generator": g_state.params}
            if d_state is not None:
                payload["disc"] = d_state.params
            ckpt.save(it + 1, payload, wait=it + 1 == total_iters)
        if it + 1 < total_iters:
            batch = next_batch()
    ckpt.close()
    logger("[inpaint] training done")


def _train_mattor(cfg, total_iters, seed, logger=print):
    """Matting end-to-end training (reference mattors/{dim,gca,indexnet}.py
    forward_train): alpha L1 on the unknown region (+ composition loss
    when configured), comp1k data source."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_vcve_tpu.core.builder import (
        build_dataset,
        build_generator,
        build_optimizer,
    )
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.losses import l1_composition_loss, masked_l1_loss

    mdl = cfg.model
    backbone = build_generator(dict(mdl["backbone"]))
    in_ch = dict(mdl["backbone"]).get("in_channels", 4)
    trimap_key = "trimap_onehot" if in_ch == 6 else "trimap"

    ds = build_dataset(dict(cfg.data["train"]))
    bsz = cfg.data.get("train_dataloader", {}).get("samples_per_gpu", 1)
    rng = np.random.default_rng(seed)

    def next_batch():
        samples = [ds.sample(rng) for _ in range(bsz)]
        stack = lambda k: jnp.asarray(np.stack([s[k] for s in samples]))
        return {k: stack(k) for k in
                ("merged", "alpha", "fg", "bg", "trimap", "trimap_onehot")}

    first = next_batch()
    variables = backbone.init(
        jax.random.PRNGKey(seed), first["merged"], first[trimap_key], True
    )
    state = create_train_state(
        variables["params"],
        build_optimizer(
            {"generator": dict(
                (cfg.get("optimizers", {}) or {}).get(
                    "backbone",
                    (cfg.get("optimizers", {}) or {}).get(
                        "generator", {"type": "Adam", "lr": 1e-4}),
                )
            )},
            cfg.get("lr_config"), total_iters,
        ),
    )
    extra = {k: v for k, v in variables.items() if k != "params"}

    w_alpha = (mdl.get("loss_alpha") or {}).get("loss_weight", 1.0)
    comp_cfg = mdl.get("loss_comp")
    w_comp = (comp_cfg or {}).get("loss_weight", 0.0)

    @jax.jit
    def train_step(state, extra, batch):
        unknown = ((batch["trimap"] > 0.1) & (batch["trimap"] < 0.9)).astype(
            jnp.float32
        )

        def loss_fn(params):
            out = backbone.apply(
                {"params": params, **extra}, batch["merged"],
                batch[trimap_key], True,
                mutable=[k for k in extra],
            )
            pred, new_extra = out if isinstance(out, tuple) else (out, extra)
            pred = jnp.clip(pred, 0.0, 1.0)
            loss = masked_l1_loss(pred, batch["alpha"], unknown) * w_alpha
            if w_comp:
                loss = loss + w_comp * l1_composition_loss(
                    pred, batch["fg"], batch["bg"], batch["merged"], unknown
                )
            return loss, new_extra

        (loss, new_extra), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads), new_extra, {"loss_alpha": loss}

    ckpt = CheckpointManager(cfg.work_dir)
    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_int = (cfg.get("checkpoint_config", {}) or {}).get("interval", 2000)
    batch = first
    for it in range(total_iters):
        state, extra, metrics = train_step(state, extra, batch)
        if (it + 1) % log_int == 0 or it + 1 == total_iters:
            logger(
                f"[mattor] iter {it + 1}/{total_iters} "
                + " ".join(f"{k}={float(jax.device_get(v)):.5f}"
                           for k, v in metrics.items())
            )
        if (ckpt_int and (it + 1) % ckpt_int == 0) or it + 1 == total_iters:
            ckpt.save(
                it + 1, {"params": state.params, **jax.device_get(extra)},
                wait=it + 1 == total_iters,
            )
        if it + 1 < total_iters:
            batch = next_batch()
    ckpt.close()
    logger("[mattor] training done")


def _train_dic(cfg, total_iters, seed, logger=print):
    """DIC face-SR training (reference restorers/dic.py:95-185 train_step):
    per-step pixel loss on every iterative SR output + align loss on every
    predicted landmark heatmap vs the GT heatmap; optional
    discriminator/feature losses kick in after ``fix_iter``
    (dic.py:132-142). Data: SRFacialLandmarkDataset."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_vcve_tpu.core.builder import (
        build_dataset,
        build_generator,
        build_optimizer,
    )
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.losses import charbonnier_loss, l1_loss, mse_loss

    mdl = cfg.model
    gen = build_generator(dict(mdl["generator"]))

    pick = {"L1Loss": l1_loss, "MSELoss": mse_loss,
            "CharbonnierLoss": charbonnier_loss}
    pix_cfg = dict(mdl.get("pixel_loss") or {"type": "L1Loss"})
    align_cfg = dict(mdl.get("align_loss") or pix_cfg)
    pixel_loss = pick.get(pix_cfg.get("type", "L1Loss"), l1_loss)
    align_loss = pick.get(align_cfg.get("type", pix_cfg.get("type")), l1_loss)
    w_pix = pix_cfg.get("loss_weight", 1.0)
    w_align = align_cfg.get("loss_weight", 0.1)

    ds = build_dataset(dict(cfg.data["train"]))
    bsz = cfg.data.get("train_dataloader", {}).get("samples_per_gpu", 1)
    rng = np.random.default_rng(seed)

    def next_batch():
        samples = [ds.sample(rng) for _ in range(bsz)]
        stack = lambda k: jnp.asarray(np.stack([s[k] for s in samples]))
        return {k: stack(k) for k in ("lq", "gt", "heatmap")}

    first = next_batch()
    params = gen.init(jax.random.PRNGKey(seed), first["lq"])["params"]
    state = create_train_state(
        params,
        build_optimizer(
            {"generator": dict(
                (cfg.get("optimizers", {}) or {}).get(
                    "generator", {"type": "Adam", "lr": 1e-4})
            )},
            cfg.get("lr_config"), total_iters,
        ),
    )

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            sr_list, hm_list = gen.apply({"params": p}, batch["lq"])
            # DICNet emits 68-keypoint heatmaps; the dataset's GT heatmap
            # carries however many keypoints the annotation has
            k = batch["heatmap"].shape[-1]
            loss = 0.0
            for sr, hm in zip(sr_list, hm_list):
                loss = loss + pixel_loss(sr, batch["gt"]) * w_pix
                loss = loss + align_loss(hm[..., :k], batch["heatmap"]) * w_align
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    ckpt = CheckpointManager(cfg.work_dir)
    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_int = (cfg.get("checkpoint_config", {}) or {}).get("interval", 2000)
    batch = first
    t_last = time.perf_counter()
    for it in range(total_iters):
        state, metrics = train_step(state, batch)
        if (it + 1) % log_int == 0 or it + 1 == total_iters:
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            logger(
                f"[dic] iter {it + 1}/{total_iters} "
                f"loss={float(jax.device_get(metrics['loss'])):.5f} "
                f"({log_int / max(dt, 1e-9):.2f} it/s)"
            )
        if (ckpt_int and (it + 1) % ckpt_int == 0) or it + 1 == total_iters:
            ckpt.save(it + 1, {"generator": state.params},
                      wait=it + 1 == total_iters)
        if it + 1 < total_iters:
            batch = next_batch()
    ckpt.close()
    logger("[dic] training done")


def main():
    args = parse_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import (
        build_optimizer,
        build_restorer,
        build_train_datasets,
    )
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.data.loader import PrefetchLoader, WeightedMixture
    from pnp_vcve_tpu.parallel.sharding import batch_sharding, make_mesh, replicated
    from pnp_vcve_tpu.train import create_train_state, make_train_step
    from pnp_vcve_tpu.train.loop import train_loop

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    if args.exp_name:
        cfg.work_dir = os.path.join("./work_dirs", args.exp_name)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    total_iters = args.total_iters or cfg.total_iters
    seed = args.seed if args.seed is not None else 0

    from pnp_vcve_tpu.utils.logging import TensorboardWriter, collect_env, get_root_logger

    logger = get_root_logger(
        log_file=os.path.join(cfg.work_dir, "train.log") if cfg.get("work_dir") else None
    )
    env = collect_env()
    logger.info("Environment:\n" + "\n".join(f"  {k}: {v}" for k, v in env.items()))

    mesh = make_mesh(sp=cfg.get("mesh", {}).get("sp", 1))
    print(f"devices: {jax.devices()}  mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # CycleGAN has no `.generator`/restorer shape — dispatch on model type
    # before the restorer path (reference builds it via the same registry,
    # mmedit/models/synthesizers/cycle_gan.py:18-95)
    model_type = cfg.model.get("type") if hasattr(cfg.model, "get") else None
    if model_type == "CycleGAN":
        _train_cyclegan(cfg, total_iters, seed, logger=logger.info)
        return
    if model_type in _INPAINTOR_TYPES:
        _train_inpaintor(cfg, total_iters, seed, logger=logger.info)
        return
    if model_type in _MATTOR_TYPES:
        _train_mattor(cfg, total_iters, seed, logger=logger.info)
        return
    if model_type == "DIC":
        _train_dic(cfg, total_iters, seed, logger=logger.info)
        return

    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    model = restorer.generator

    datasets = build_train_datasets(cfg.data["train"])
    weights = cfg.data.get("train_dataloader", {}).get("weights", [1] * len(datasets))
    mixture = (
        WeightedMixture(datasets, weights) if len(datasets) > 1 else datasets[0]
    )

    samples_per_chip = cfg.data.get("train_dataloader", {}).get("samples_per_gpu", 5)
    dp = mesh.devices.shape[0]
    global_batch = samples_per_chip * dp

    # init params from one dummy batch shaped like training data
    d0 = datasets[0]
    t_frames = d0.num_input_frames
    patch = d0.gt_patch_size // d0.scale
    dummy = dict(
        lrs=jnp.zeros((1, t_frames, patch, patch, 3)),
        qps=jnp.zeros((1, t_frames)),
        slices=jnp.full((1, t_frames), 73.0),
        mvs=jnp.zeros((1, t_frames, patch, patch, 4)),
        base_qps=jnp.zeros((1, t_frames)),
        par_map=jnp.zeros((1, t_frames, patch, patch, 3)),
    )
    params = model.init(jax.random.PRNGKey(seed), **dummy)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params / 1e6:.2f}M")

    tx = build_optimizer(cfg.optimizers, cfg.get("lr_config"), total_iters)
    state = create_train_state(params, tx)
    state = jax.device_put(state, replicated(mesh))

    ckpt = CheckpointManager(cfg.work_dir)
    start_iter = 0
    if args.resume_from:
        from pnp_vcve_tpu.core.checkpoint import restore_train_state

        state, start_iter = restore_train_state(args.resume_from, state)
        state = jax.device_put(state, replicated(mesh))
        print(f"resumed full train state at iter {start_iter}")
    elif args.load_from:
        from pnp_vcve_tpu.core.checkpoint import load_params

        params = load_params(args.load_from, template=jax.device_get(state.params))
        state = state.replace(params=jax.device_put(params, replicated(mesh)))
        print(f"loaded weights from {args.load_from}")

    tr_cfg = cfg.get("train_cfg", {}) or {}
    # fix_iter freezes SPyNet/EDVR-style submodules for the warmup
    # (reference basicvsr.py:95-103 / mfqev2_restorer.py fix_spynet_iter);
    # the prefixes are configurable (default: the reference's frozen nets)
    fix_iter = tr_cfg.get("fix_iter", tr_cfg.get("fix_spynet_iter", 0)) or 0
    freeze_prefixes = tuple(
        tr_cfg.get("freeze_prefixes", ("spynet", "edvr"))
    )
    train_step = make_train_step(
        model, restorer.loss_fn(), fix_iter=fix_iter,
        freeze_prefixes=freeze_prefixes,
    )

    loader = PrefetchLoader(
        mixture,
        batch_size=global_batch,
        seed=seed,
        num_threads=cfg.data.get("workers_per_gpu", 6),
        sharding=batch_sharding(mesh, ndim=1),
        start_step=start_iter,
    )

    # --- GAN training path (reference DCNGAN train_step,
    # mmedit/models/restorers/dcngan.py:81-228): generator + discriminator
    # states, adversarial + pixel (+ fm, + VGG perceptual) losses. Selected
    # by a `discriminator` entry in cfg.model.
    disc_cfg = cfg.model.get("discriminator") if hasattr(cfg.model, "get") else None
    if disc_cfg is not None:
        _train_gan(
            cfg, model, loader, mesh, total_iters, seed, start_iter, state,
        )
        loader.stop()
        ckpt.close()
        return

    def remap(batch):
        return {
            "lq": batch["lq"],
            "gt": batch["gt"],
            "qps": batch["qps"],
            "slices": batch["slices"],
            "mvs": batch["mvs"],
            "base_qps": batch["base_qps"],
            "partitions": batch["partitions"],
        }

    class _Remapped:
        def __iter__(self):
            for b in loader:
                yield remap(b)

    # periodic validation (reference DistEvalIterHook every `interval` iters,
    # mmedit/core/evaluation/eval_hooks.py:71-114, cfg key `evaluation`)
    eval_cfg = cfg.get("evaluation", {}) or {}
    eval_interval = int(eval_cfg.get("interval", 0) or 0)
    eval_fn = None
    val_cfg = cfg.data.get("val")
    if eval_interval and val_cfg is not None:
        from pnp_vcve_tpu.core.builder import build_dataset
        from pnp_vcve_tpu.train.eval import evaluate_dataset

        val_dataset = build_dataset(dict(val_cfg))
        val_save_path = (
            os.path.join(cfg.work_dir, "val")
            if eval_cfg.get("save_image", False)
            else None
        )

        def eval_fn(params):
            return evaluate_dataset(
                restorer,
                params,
                val_dataset,
                save_path=val_save_path,
                save_image=bool(eval_cfg.get("save_image", False)),
                chunk_t=eval_cfg.get("chunk_t"),
                verbose=False,
            )

    # VisualizationHook analog (reference core/hooks/visualization.py; cfg
    # key visual_config, None in the shipped PnP configs)
    visual_fn = None
    vcfg = cfg.get("visual_config") or None
    if vcfg and int(vcfg.get("interval", -1) or -1) > 0:
        import numpy as _np

        from pnp_vcve_tpu.train.visualization import VisualizationHook

        vhook = VisualizationHook(
            output_dir=vcfg.get(
                "output_dir", os.path.join(cfg.work_dir, "visual")
            ),
            res_name_list=list(
                vcfg.get("res_name_list", ["lq", "gt", "output"])
            ),
            interval=int(vcfg["interval"]),
            rerange=bool(vcfg.get("rerange", False)),
            nrow=int(vcfg.get("nrow", 1)),
            padding=int(vcfg.get("padding", 4)),
        )

        def visual_fn(step, batch, vstate):
            if (step + 1) % vhook.interval != 0:
                return
            from pnp_vcve_tpu.train.train_step import _model_inputs

            out = model.apply({"params": vstate.params}, **_model_inputs(batch))
            res = {
                "lq": _np.asarray(batch["lq"]),
                "gt": _np.asarray(batch["gt"]),
                "output": _np.asarray(out),
            }
            vhook(step, res)

    log_int = cfg.get("log_config", {}).get("interval", 100)
    ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
    tb = TensorboardWriter(os.path.join(cfg.work_dir, "tb"))
    train_loop(
        state,
        train_step,
        _Remapped(),
        total_iters=total_iters,
        log_interval=log_int,
        checkpoint_interval=ckpt_cfg.get("interval", 2000),
        save_optimizer=bool(ckpt_cfg.get("save_optimizer", True)),
        eval_interval=eval_interval,
        eval_fn=eval_fn,
        ckpt_manager=ckpt,
        start_iter=start_iter,
        logger=logger.info,
        metrics_writer=tb,
        visual_fn=visual_fn,
    )
    loader.stop()
    tb.close()
    ckpt.close()


if __name__ == "__main__":
    main()
