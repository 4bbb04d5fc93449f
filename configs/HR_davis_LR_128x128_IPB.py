"""IPB variant: the CAA's QP input is replaced by the slice-type ordinal
(reference configs/HR_davis_LR_128x128_IPB.py — differs from the flagship
only by ``replace_qp_withIPB=True`` on every codec-prior loader)."""

from pnp_vcve_tpu.core.presets import flagship_data

_base_ = ["HR_davis_LR_128x128.py"]

exp_name = "HR_davis_LR_128x128_IPB"
work_dir = f"./work_dirs/{exp_name}"

data = flagship_data(replace_qp_withIPB=True)
