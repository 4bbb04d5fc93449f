"""Flagship PnP-VCVE training config (TPU).

Functional mirror of the reference configs/HR_davis_LR_128x128.py: same
model hyper-parameters, tri-dataset 1:2:1 weighted mixture, CRF mixture
ratios, optimizer and schedule. Keys keep the reference names so
``--cfg-options`` overrides carry over.
"""

from pnp_vcve_tpu.core.presets import flagship_data, flagship_model

exp_name = "HR_davis_LR_128x128"

model = flagship_model()
train_cfg = dict(fix_iter=5000)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)

data = flagship_data()

optimizers = dict(generator=dict(type="Adam", lr=2e-4, betas=(0.9, 0.99)))

total_iters = 300000
lr_config = dict(
    policy="CosineRestart",
    by_epoch=False,
    periods=[300000],
    restart_weights=[1],
    min_lr=1e-7,
)

checkpoint_config = dict(interval=2000, save_optimizer=True, by_epoch=False)
evaluation = dict(interval=5000, save_image=False)
log_config = dict(interval=100)
log_level = "INFO"
work_dir = f"./work_dirs/{exp_name}"
load_from = None
resume_from = None

# TPU runtime (replaces dist_params=dict(backend='nccl')): dp x sp mesh;
# sp>1 shards the spatial width axis with XLA halo exchange.
mesh = dict(sp=1)
