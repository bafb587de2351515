from vqvae3d_tpu.ops.conv3d import conv3d, pad3d, Conv3D
from vqvae3d_tpu.ops.resize import (
    trilinear_upsample2x,
    trilinear_resize,
    area_resize,
    nearest_upsample,
)
