from infinite_texture_gans_tpu.ops.grid import (
    grid_to_patches,
    patches_to_grid,
    merge_patches_into_image,
    crop_images,
    crop_image,
    upsample_nearest,
)
from infinite_texture_gans_tpu.ops.pallas_conv import (
    conv1x1_chw,
    conv1x1_chw_add,
    conv3x3_chw,
)
from infinite_texture_gans_tpu.ops.padding import (
    SiteSpec,
    SiteState,
    GridPos,
    local_pad,
    halo_pad_step,
    init_halo_state,
    finalize_row,
    rotate_rows,
)

__all__ = [
    "grid_to_patches",
    "patches_to_grid",
    "merge_patches_into_image",
    "crop_images",
    "crop_image",
    "upsample_nearest",
    "conv3x3_chw",
    "conv1x1_chw",
    "conv1x1_chw_add",
    "SiteSpec",
    "SiteState",
    "GridPos",
    "local_pad",
    "halo_pad_step",
    "init_halo_state",
    "finalize_row",
    "rotate_rows",
]
