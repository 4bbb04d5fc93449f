"""CycleGAN unpaired image-to-image translation.

Reference recipe: mmedit/models/synthesizers/cycle_gan.py:18-199 with
ResnetGenerator + PatchDiscriminator (upstream mmediting
configs/synthesizers/cyclegan): LSGAN adversarial loss, cycle-consistency
L1 x10, identity L1 x0.5, unpaired domain folders
``dataroot/{train,test}{A,B}``. Routed by tools/train.py's
``type == 'CycleGAN'`` dispatch to train.gan.make_cyclegan_train_step.
"""

exp_name = "cyclegan_lsgan_resnet"

model = dict(
    type="CycleGAN",
    generator=dict(
        type="ResnetGenerator",
        in_channels=3,
        out_channels=3,
        base_channels=64,
        num_blocks=9,
    ),
    discriminator=dict(
        type="PatchDiscriminator",
        in_channels=3,
        base_channels=64,
        num_conv=3,
    ),
    gan_loss=dict(type="GANLoss", gan_type="lsgan", loss_weight=1.0),
    cycle_loss=dict(type="L1Loss", loss_weight=10.0),
    id_loss=dict(type="L1Loss", loss_weight=0.5),
)
train_cfg = None
test_cfg = None

data = dict(
    workers_per_gpu=4,
    train_dataloader=dict(samples_per_gpu=1, drop_last=True),
    train=dict(
        type="GenerationUnpairedDataset",
        dataroot="dataset/horse2zebra",
        test_mode=False,
        crop_size=256,
        flip=True,
    ),
)

optimizers = dict(
    generators=dict(type="Adam", lr=2e-4, betas=(0.5, 0.999)),
    discriminators=dict(type="Adam", lr=2e-4, betas=(0.5, 0.999)),
)
lr_config = None
total_iters = 250000
checkpoint_config = dict(interval=10000, save_optimizer=True, by_epoch=False)
evaluation = dict(interval=0)
log_config = dict(interval=100)
mesh = dict(sp=1)
