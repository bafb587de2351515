import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.data import nrrd_io
from vqvae3d_tpu.models.blocks import silu_velocity
from vqvae3d_tpu.models.causal_blocks import (
    GatedResBlock,
    input_to_stack,
    stack_to_output,
)

KEY = jax.random.PRNGKey(0)


def test_silu_velocity_custom_vjp_matches_autodiff():
    x = jax.random.normal(KEY, (4, 5))
    v = jax.random.normal(jax.random.PRNGKey(1), (5,))

    def manual(x, v):
        return jnp.sum(silu_velocity(x, v) ** 2)

    def auto(x, v):
        return jnp.sum((x * jax.nn.sigmoid(x * v)) ** 2)

    gx_m, gv_m = jax.grad(manual, argnums=(0, 1))(x, v)
    gx_a, gv_a = jax.grad(auto, argnums=(0, 1))(x, v)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_m), np.asarray(gv_a), rtol=1e-5)
    # forward equality
    np.testing.assert_allclose(
        np.asarray(silu_velocity(x, v)),
        np.asarray(x * jax.nn.sigmoid(x * v)),
        rtol=1e-6,
    )


DIMS = (3, 3, 3)


def _raster(dims):
    for i0 in range(dims[0]):
        for i1 in range(dims[1]):
            for i2 in range(dims[2]):
                yield (i0, i1, i2)


def _flat(pos, dims):
    return (pos[0] * dims[1] + pos[1]) * dims[2] + pos[2]


def test_gated_resblock_shapes_and_causality():
    x = jax.random.uniform(KEY, (1, *DIMS, 4))
    block = GatedResBlock(kernel_size=3, mask="A", dtype=jnp.float32)
    stack = input_to_stack(x)
    out, variables = block.init_with_output(KEY, stack)
    assert out[0].shape == x.shape

    def apply_fn(xin):
        o = block.apply(variables, input_to_stack(xin))
        return stack_to_output(o)

    base = np.asarray(apply_fn(x))
    for v in [(0, 0, 0), (1, 1, 1), (2, 0, 2)]:
        x2 = x.at[(0, *v, slice(None))].add(2.0)
        diff = np.abs(np.asarray(apply_fn(x2)) - base).sum(-1)[0]
        for p in _raster(DIMS):
            if _flat(p, DIMS) <= _flat(v, DIMS):
                assert diff[p] == 0.0, (v, p)


def test_gated_resblock_condition():
    x = jax.random.uniform(KEY, (1, *DIMS, 4))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, *DIMS, 6))
    block = GatedResBlock(kernel_size=3, mask="B", condition_dim=6, dtype=jnp.float32)
    out, variables = block.init_with_output(KEY, input_to_stack(x), condition=cond)
    assert out[0].shape == x.shape


def test_slice_dataset_and_sampler(tmp_path):
    rng = np.random.default_rng(0)
    depths = [5, 7]
    for i, d in enumerate(depths):
        vol = rng.integers(-500, 500, size=(16, 16, d)).astype(np.int16)
        nrrd_io.write(
            tmp_path / f"s{i}.nrrd", vol, header={"spacings": (0.976, 0.976, 3)}
        )

    from vqvae3d_tpu.data.slice_dataset import CTSliceDataset, SliceSampler

    ds = CTSliceDataset(str(tmp_path), size=(16, 16, None))
    assert len(ds) == 12
    sl = ds[6]
    assert sl.shape == (16, 16, 1)
    assert sl.min() >= -0.5 and sl.max() <= 4.0

    for mode in ("none", "inter", "intra", "both"):
        order = list(SliceSampler(ds, mode=mode, seed=1))
        assert sorted(order) == list(range(12))
    assert list(SliceSampler(ds, mode="none")) == list(range(12))
    with pytest.raises(ValueError):
        SliceSampler(ds, mode="bogus")


def test_data_marginal_cli(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(2):
        vol = rng.integers(-1000, 1500, size=(16, 16, 8)).astype(np.int16)
        nrrd_io.write(
            tmp_path / f"s{i}.nrrd", vol, header={"spacings": (0.976, 0.976, 3)}
        )
    from vqvae3d_tpu.cli import data_marginal
    import vqvae3d_tpu.data.ct_dataset as cd

    out = tmp_path / "marginal.npz"
    args = data_marginal.parse_arguments(
        [str(tmp_path), "--out", str(out), "--bins", "32", "--scan-size", "16", "16"]
    )
    orig = cd.CTDataModule.__init__

    def patched(self, *a, **kw):
        kw["output_depth"] = 8
        return orig(self, *a, **kw)

    cd.CTDataModule.__init__ = patched
    try:
        counts = data_marginal.main(args)
    finally:
        cd.CTDataModule.__init__ = orig
    assert counts.sum() > 0
    loaded = np.load(out)
    assert loaded["counts"].shape == (32,)
