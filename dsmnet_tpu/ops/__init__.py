"""Pure-function compute ops: kernels and primitives shared by the zoo."""

from .corr import corr1d, corr1d_reference
from .cost_volume import concat_cost_volume, concat_cost_volume_reference
from .gradients import (
    c_ds1,
    c_ds2,
    c_ds3,
    c_imdiff1,
    diff1_dx,
    diff1_dy,
    diff2_dx,
    diff2_dy,
    diff_z_dx,
    diff_z_dy,
)
from .resize import (
    resize_bilinear,
    resize_trilinear,
    upsample2x,
    upsample_bilinear,
)
from .softargmin import soft_argmin
from .ssim import ssim_map
from .warp import imwarp, warp_disparity

__all__ = [
    "corr1d",
    "corr1d_reference",
    "concat_cost_volume",
    "concat_cost_volume_reference",
    "c_ds1",
    "c_ds2",
    "c_ds3",
    "c_imdiff1",
    "diff1_dx",
    "diff1_dy",
    "diff2_dx",
    "diff2_dy",
    "diff_z_dx",
    "diff_z_dy",
    "resize_bilinear",
    "resize_trilinear",
    "upsample2x",
    "upsample_bilinear",
    "soft_argmin",
    "ssim_map",
    "imwarp",
    "warp_disparity",
]
