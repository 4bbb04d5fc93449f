"""IPB variant pointed at the REDS LR (X4) test set — the VSR
pre-enhancement path feeding a downstream VSR model
(reference configs/HR_davis_LR_128x128_IPB_LR_test.py)."""

from pnp_vcve_tpu.core.presets import flagship_data

_base_ = ["HR_davis_LR_128x128_IPB.py"]

exp_name = "HR_davis_LR_128x128_IPB_LR_test"
work_dir = f"./work_dirs/{exp_name}"

data = flagship_data(
    replace_qp_withIPB=True,
    test_lq="dataset/REDS_test_LR/crf15/png",
    test_gt="dataset/REDS_test_LR/X4/png",
    test_qp_json="dataset/REDS_test_LR/multi_cprs_REDS_test_LR.json",
)
