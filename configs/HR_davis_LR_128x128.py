"""Flagship PnP-VCVE training config (TPU).

Functional mirror of the reference configs/HR_davis_LR_128x128.py: the same
model hyper-parameters, tri-dataset weighted mixture (REDS-HR : REDS-LR :
DAVIS at 1:2:1), CRF mixture ratios, optimizer and schedule. Keys keep the
reference names so ``--cfg-options`` overrides carry over.
"""

exp_name = "HR_davis_LR_128x128"

model = dict(
    type="BasicVSR",
    generator=dict(
        type="IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par",
        mid_channels=64,
        num_blocks=8,
        padding=3,
        with_cat=True,
        use_base_qp=True,
        num_experts=6,
        expert_softmax=True,
        init_weight=True,
        with_bias=True,
        with_se=True,
        with_par=True,
        one_layer=True,
        blocktype="drt",
        channel_first=True,
        sparse_val=False,
        align_key=True,
        vsr=False,
    ),
    pixel_loss=dict(type="CharbonnierLoss", loss_weight=1.0, reduction="mean"),
)

train_cfg = dict(fix_iter=5000)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)

compress_data_ratio = [0.2, 0.6, 0.85, 1]


def _mix_pipeline(qp_slice_file, filename_tmpl="{:08d}.png"):
    return [
        dict(
            type="GenerateSegmentIndices_Mix_Compress",
            interval_list=[1],
            filename_tmpl=filename_tmpl,
        ),
        dict(
            type="LoadImageFromFileList_Mix_Compress_ipb",
            key="lq",
            channel_order="rgb",
            random_compress=True,
            load_mv=True,
            load_qp_slice=True,
            load_base_qp=True,
            load_partition=True,
            drconv=True,
            qp_slice_file=qp_slice_file,
            data_ratio=compress_data_ratio,
        ),
        dict(type="LoadImageFromFileList", key="gt", channel_order="rgb"),
        dict(
            type="RescaleToZeroOne",
            keys=["lq", "gt", "base_QPs", "QPs", "partitions"],
        ),
        dict(type="PairedRandomCrop_mv", gt_patch_size=128),
        dict(type="Flip", keys=["lq", "gt", "mvs", "partitions"], flip_ratio=0.5, direction="horizontal"),
        dict(type="Flip", keys=["lq", "gt", "mvs", "partitions"], flip_ratio=0.5, direction="vertical"),
        dict(type="RandomTransposeHW", keys=["lq", "gt", "mvs", "partitions"], transpose_ratio=0.5),
    ]


def _train_reds(root, gt_sub, qp_json):
    return dict(
        type="RepeatDataset",
        times=1000,
        dataset=dict(
            type="SRREDSMultipleGTMixCompressDataset",
            lq_folder=f"{root}/crf15/png",
            cprs15_folder=f"{root}/crf15/png",
            cprs25_folder=f"{root}/crf25/png",
            cprs35_folder=f"{root}/crf35/png",
            gt_folder=f"{root}/{gt_sub}/png",
            num_input_frames=15,
            pipeline=_mix_pipeline(qp_json),
            scale=1,
            val_partition="REDS4",
            test_mode=False,
        ),
    )


test_pipeline = [
    dict(type="GenerateSegmentIndices_LR", interval_list=[1]),
    dict(
        type="LoadImageFromFileList_ipb",
        key="lq",
        channel_order="rgb",
        random_compress=False,
        load_mv=True,
        load_qp_slice=True,
        load_base_qp=True,
        load_partition=True,
        drconv=True,
        qp_slice_file="dataset/REDS_test_HR/multi_cprs_REDS_test_HR.json",
    ),
    dict(type="LoadImageFromFileList", key="gt", channel_order="rgb"),
    dict(type="RescaleToZeroOne", keys=["lq", "gt", "base_QPs", "QPs", "partitions"]),
]

data = dict(
    workers_per_gpu=6,
    train_dataloader=dict(
        samples_per_gpu=5, drop_last=True, mix_data=True, weights=[1, 2, 1], replacement=False
    ),
    val_dataloader=dict(samples_per_gpu=1),
    test_dataloader=dict(samples_per_gpu=1, workers_per_gpu=1),
    train=[
        _train_reds("dataset/REDS_train_HR", "sharp", "dataset/REDS_train_HR/REDS_train_HR.json"),
        _train_reds("dataset/REDS_train_LR", "X4", "dataset/REDS_train_LR/REDS_train_LR.json"),
        dict(
            type="RepeatDataset",
            times=1000,
            dataset=dict(
                type="DAVISMultipleGTMixCompressDataset",
                lq_folder="dataset/davis_all/crf15/png",
                cprs15_folder="dataset/davis_all/crf15/png",
                cprs25_folder="dataset/davis_all/crf25/png",
                cprs35_folder="dataset/davis_all/crf35/png",
                gt_folder="dataset/davis_all/sharp/png",
                num_input_frames=15,
                pipeline=_mix_pipeline(
                    "dataset/davis_all/train_2017_QP_slice_all.json", "{:05d}.png"
                ),
                scale=1,
                test_mode=False,
            ),
        ),
    ],
    val=dict(
        type="SRREDSMultipleGTCompressDataset",
        lq_folder="dataset/REDS_test_HR/crf35/png",
        gt_folder="dataset/REDS_test_HR/X4/png",
        num_input_frames=100,
        pipeline=test_pipeline,
        scale=1,
        val_partition="REDS4",
        test_mode=True,
    ),
    test=dict(
        type="SRREDSMultipleGTCompressDataset",
        lq_folder="dataset/REDS_test_HR/crf35/png",
        gt_folder="dataset/REDS_test_HR/X4/png",
        num_input_frames=100,
        pipeline=test_pipeline,
        scale=1,
        val_partition="REDS4",
        test_mode=True,
    ),
)

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
