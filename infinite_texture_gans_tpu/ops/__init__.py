from infinite_texture_gans_tpu.ops.grid import (
    grid_to_patches,
    patches_to_grid,
    merge_patches_into_image,
    crop_images,
    upsample_nearest,
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
    "upsample_nearest",
    "SiteSpec",
    "SiteState",
    "GridPos",
    "local_pad",
    "halo_pad_step",
    "init_halo_state",
    "finalize_row",
    "rotate_rows",
]
