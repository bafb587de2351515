import jax
import jax.numpy as jnp
import numpy as np

from vqvae3d_tpu.ops.resize import (
    area_resize,
    trilinear_resize,
    trilinear_upsample2x,
)

KEY = jax.random.PRNGKey(0)


def test_upsample2x_matches_jax_image_resize():
    x = jax.random.normal(KEY, (2, 5, 6, 4, 3))
    got = trilinear_upsample2x(x)
    want = jax.image.resize(x, (2, 10, 12, 8, 3), method="trilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_upsample2x_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(1, 4, 5, 3, 2)).astype(np.float32)
    got = np.asarray(trilinear_upsample2x(jnp.asarray(x)))
    # torch expects NCDHW
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(
        xt, scale_factor=2, mode="trilinear", align_corners=False
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_area_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(1, 8, 8, 4, 1)).astype(np.float32)
    got = np.asarray(area_resize(jnp.asarray(x), (4, 4, 4)))
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(xt, size=(4, 4, 4), mode="area").permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_resize_arbitrary():
    x = jax.random.normal(KEY, (1, 4, 4, 2, 3))
    y = trilinear_resize(x, (8, 12, 6))
    assert y.shape == (1, 8, 12, 6, 3)


def test_area_resize_arbitrary_size_matches_torch():
    """Non-integer shrink factors use adaptive-avg-pool bins (round-2:
    the reference's Interpolate(mode='area') accepted arbitrary sizes)."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(1).normal(size=(2, 7, 10, 5, 3)).astype(np.float32)
    got = np.asarray(area_resize(jnp.asarray(x), (5, 6, 3)))
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(xt, size=(5, 6, 3), mode="area").permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_area_rescale_np_arbitrary_matches_torch():
    import torch
    import torch.nn.functional as F

    from vqvae3d_tpu.data.ct_dataset import _area_rescale_np

    x = np.random.default_rng(2).normal(size=(9, 7, 6)).astype(np.float32)
    got = _area_rescale_np(x, (4, 5, 6))
    xt = torch.tensor(x)[None, None]
    want = F.interpolate(xt, size=(4, 5, 6), mode="area")[0, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
