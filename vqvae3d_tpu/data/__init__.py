from vqvae3d_tpu.data.transforms import (
    hu_window_normalize,
    hu_unnormalize,
    depth_pad_and_crop,
    create_cylinder_xy_mask,
    extract_center_cylinder,
)
