import numpy as np
import pytest

from vqvae3d_tpu.data import nrrd_io
from vqvae3d_tpu.data.code_store import CodeDataModule, CodeDataset, CodeStore, CodeStoreWriter
from vqvae3d_tpu.data.ct_dataset import CTDataModule, CTScanDataset, _area_rescale_np
from vqvae3d_tpu.data.sample_db import (
    add_samples,
    create_or_load_db,
    get_condition_uuids,
    get_conditions,
    save_db,
)
from vqvae3d_tpu.data.transforms import (
    create_cylinder_xy_mask,
    depth_pad_and_crop,
    hu_unnormalize,
    hu_window_normalize,
)


def test_nrrd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.integers(-1000, 2000, size=(32, 24, 7)).astype(np.int16)
    p = tmp_path / "a.nrrd"
    nrrd_io.write(p, vol, header={"spacings": (0.976, 0.976, 3.0)})
    data, header = nrrd_io.read(p)
    np.testing.assert_array_equal(data, vol)
    np.testing.assert_allclose(header["spacings"], [0.976, 0.976, 3.0])
    h = nrrd_io.read_header(p)
    np.testing.assert_array_equal(h["sizes"], [32, 24, 7])


def test_nrrd_raw_and_float(tmp_path):
    vol = np.random.default_rng(1).normal(size=(8, 8, 3)).astype(np.float32)
    p = tmp_path / "f.nrrd"
    nrrd_io.write(p, vol, encoding="raw")
    data, _ = nrrd_io.read(p)
    np.testing.assert_array_equal(data, vol)


def test_nrrd_space_directions(tmp_path):
    vol = np.zeros((4, 4, 2), np.int16)
    p = tmp_path / "sd.nrrd"
    nrrd_io.write(
        p, vol, header={"space directions": [(0.976, 0, 0), (0, 0.976, 0), (0, 0, 3)]}
    )
    h = nrrd_io.read_header(p)
    np.testing.assert_allclose(np.diag(h["space directions"]), [0.976, 0.976, 3])


def test_hu_normalize_range():
    hu = np.array([-3000, -1500, 0, 3000, 5000], np.float32)
    v = hu_window_normalize(hu)
    np.testing.assert_allclose(v, [-0.5, -0.5, 1.0, 4.0, 4.0])
    back = hu_unnormalize(np.array([-0.5, 1.0, 4.0]))
    np.testing.assert_array_equal(back, [-1500, 0, 3000])


def test_depth_pad_and_crop():
    v, n = depth_pad_and_crop(np.ones((4, 4, 100)), 128)
    assert v.shape == (4, 4, 128) and n == 100
    assert v[..., 100:].sum() == 0
    v2, n2 = depth_pad_and_crop(np.ones((4, 4, 200)), 128)
    assert v2.shape == (4, 4, 128) and n2 == 128


def test_cylinder_mask():
    m = create_cylinder_xy_mask((16, 16))
    assert m.shape == (16, 16)
    assert m[8, 8] and not m[0, 0]
    frac = m.mean()
    assert 0.7 < frac < 0.85  # ~pi/4


def _write_fake_scan(path, shape=(64, 64, 20), spacing=(0.976, 0.976, 3)):
    rng = np.random.default_rng(abs(hash(str(path))) % 2**32)
    vol = rng.integers(-1000, 1500, size=shape).astype(np.int16)
    nrrd_io.write(path, vol, header={"spacings": spacing})


def test_ct_dataset_filtering_and_loading(tmp_path):
    for i in range(3):
        _write_fake_scan(tmp_path / f"scan{i}.nrrd")
    _write_fake_scan(tmp_path / "badsize.nrrd", shape=(32, 64, 20))
    _write_fake_scan(tmp_path / "badspacing.nrrd", spacing=(1.0, 1.0, 3))

    with pytest.warns(UserWarning):
        ds = CTScanDataset(
            str(tmp_path), size=(64, 64, None), output_depth=32
        )
    assert len(ds) == 3
    vol, nv = ds[0]
    assert vol.shape == (64, 64, 32, 1)
    assert nv == 20
    assert vol.min() >= -0.5 and vol.max() <= 4.0


def test_ct_datamodule_batches(tmp_path):
    for i in range(5):
        _write_fake_scan(tmp_path / f"scan{i}.nrrd")
    dm = CTDataModule(
        str(tmp_path),
        batch_size=2,
        train_frac=0.8,
        size=(64, 64, None),
        output_depth=32,
        rescale_input=(32, 32, 32),
    )
    assert dm.train_len == 4 and dm.val_len == 1
    batches = list(dm.train_dataloader())
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["volume"].shape == (2, 32, 32, 32, 1)
    assert b["num_valid_slices"].shape == (2,)


def test_area_rescale_np():
    v = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = _area_rescale_np(v, (2, 2, 1))
    np.testing.assert_allclose(out, [[[2.5], [4.5]], [[10.5], [12.5]]])


@pytest.mark.parametrize("backend", ["file"])
def test_code_store_roundtrip(tmp_path, backend):
    rng = np.random.default_rng(0)
    grids = [
        [rng.integers(0, 16, (8, 8, 2)), rng.integers(0, 32, (2, 2, 1))]
        for _ in range(4)
    ]
    with CodeStoreWriter(
        str(tmp_path / "codes"), num_levels=2, num_embeddings=[16, 32], backend=backend
    ) as w:
        for i, g in enumerate(grids):
            w.write_sample(i, g)

    store = CodeStore(str(tmp_path / "codes"))
    assert store.length == 4 and store.num_levels == 2
    assert store.num_embeddings == [16, 32]
    np.testing.assert_array_equal(store.get(2, 0), grids[2][0])

    # level-0 dataset: pairs (data, condition=level 1)
    ds = CodeDataset(str(tmp_path / "codes"), embedding_id=0)
    assert ds.num_embeddings == [16, 32]
    item = ds[1]
    assert len(item) == 2
    np.testing.assert_array_equal(item[0], grids[1][0])
    np.testing.assert_array_equal(item[1], grids[1][1])

    # coarsest level: unconditional, condition dim 0
    ds1 = CodeDataset(str(tmp_path / "codes"), embedding_id=1)
    assert ds1.num_embeddings == [32, 0]
    assert len(ds1[0]) == 1

    dm = CodeDataModule(str(tmp_path / "codes"), embedding_id=0, batch_size=2, train_frac=1.0)
    batch = next(dm.train_dataloader())
    assert batch["data"].shape == (2, 8, 8, 2)
    assert batch["condition"].shape == (2, 2, 2, 1)


def test_sample_db_roundtrip(tmp_path):
    p = tmp_path / "samples.db"
    db = create_or_load_db(p, level=1)
    rng = np.random.default_rng(0)
    uuids1 = add_samples(db, 1, rng.integers(0, 32, (3, 2, 2, 1)), None)
    save_db(db, p, level=1)

    db2 = create_or_load_db(p, level=0)
    assert len(db2[1]) == 3
    cond_uuids = get_condition_uuids(db2, 0, num_conditions=2)
    conds = get_conditions(db2, 0, cond_uuids)
    assert conds.shape == (2, 2, 2, 1)
    # more conditions than available → repeats allowed
    many = get_condition_uuids(db2, 0, num_conditions=7)
    assert len(many) == 7

    uuids0 = add_samples(db2, 0, rng.integers(0, 16, (2, 8, 8, 2)), cond_uuids)
    save_db(db2, p, level=0)
    db3 = create_or_load_db(p, level=0)
    assert len(db3[0]) == 2 and len(db3[1]) == 3
    some = next(iter(db3[0].values()))
    assert some["condition"] in db3[1]


def test_device_prefetch():
    import jax
    from vqvae3d_tpu.data.device_feed import device_prefetch

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))


def test_fold_volume_np_matches_space_to_depth():
    """Host-side pre-fold must be bit-identical to the in-jit stem fold."""
    import jax.numpy as jnp
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np
    from vqvae3d_tpu.ops.resize import space_to_depth

    rng = np.random.default_rng(3)
    v = rng.normal(size=(2, 8, 8, 4, 1)).astype(np.float32)
    got = fold_volume_np(v, 2)
    want = np.asarray(space_to_depth(jnp.asarray(v), 2))
    np.testing.assert_array_equal(got, want)
    # factor 1 is the identity
    assert fold_volume_np(v, 1) is v


def test_dataloader_fold_param(tmp_path):
    """train_dataloader(fold=f) yields pre-folded volumes whose unfold
    round-trips exactly."""
    import jax.numpy as jnp
    from vqvae3d_tpu.data import nrrd_io
    from vqvae3d_tpu.data.ct_dataset import CTDataModule
    from vqvae3d_tpu.ops.resize import depth_to_space

    rng = np.random.default_rng(0)
    for i in range(2):
        vol = rng.integers(-1000, 2000, size=(16, 16, 6)).astype(np.int16)
        nrrd_io.write(
            str(tmp_path / f"s{i}.nrrd"),
            vol,
            header={"spacings": (0.976, 0.976, 3.0)},
        )
    dm = CTDataModule(
        str(tmp_path),
        batch_size=1,
        train_frac=1.0,
        num_workers=1,
        output_depth=8,
        size=(16, 16, None),
    )
    plain = next(iter(dm.train_dataloader(fold=1)))
    folded = next(iter(dm.train_dataloader(fold=2)))
    assert folded["volume"].shape == (1, 8, 8, 4, 8)
    unfolded = np.asarray(depth_to_space(jnp.asarray(folded["volume"]), 2))
    np.testing.assert_array_equal(unfolded, plain["volume"])
    np.testing.assert_array_equal(
        folded["num_valid_slices"], plain["num_valid_slices"]
    )


def test_get_folded_matches_reference_path(tmp_path):
    """CTScanDataset.get_folded (fused int16-domain decode+pad+fold+
    normalize) is bit-identical to __getitem__ → fold_volume_np, for both
    padded (d < output_depth) and truncated (d > output_depth) scans."""
    from vqvae3d_tpu.data import nrrd_io
    from vqvae3d_tpu.data.ct_dataset import CTScanDataset, fold_volume_np

    rng = np.random.default_rng(3)
    for i, d in enumerate((6, 12)):  # pad and truncate vs output_depth=8
        vol = rng.integers(-2000, 3500, size=(16, 16, d)).astype(np.int16)
        nrrd_io.write(
            str(tmp_path / f"s{i}.nrrd"),
            vol,
            header={"spacings": (0.976, 0.976, 3.0)},
        )
    ds = CTScanDataset(str(tmp_path), size=(16, 16, None), output_depth=8)
    assert len(ds) == 2
    for i in range(2):
        ref_vol, ref_nv = ds[i]
        ref = fold_volume_np(ref_vol[None], 2)[0]
        got, nv = ds.get_folded(i, 2)
        assert nv == ref_nv
        np.testing.assert_array_equal(got, ref)


def test_unfold_volume_np_inverts_fold():
    from vqvae3d_tpu.data.ct_dataset import fold_volume_np, unfold_volume_np

    rng = np.random.default_rng(5)
    v = rng.normal(size=(2, 8, 4, 6, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        unfold_volume_np(fold_volume_np(v, 2), 2), v
    )
    assert unfold_volume_np(v, 1) is v


def test_volume_cache_bit_identical(tmp_path):
    """Decode-once fold-on-write cache (r5): the cached second read must be
    BIT-identical to the uncached path, for both the plain and the fused
    folded reader; cache keys self-invalidate on file change."""
    from vqvae3d_tpu.data import nrrd_io
    from vqvae3d_tpu.data.ct_dataset import CTScanDataset

    d = tmp_path / "ct"
    d.mkdir()
    rng = np.random.default_rng(11)
    vol = rng.integers(-1200, 2800, size=(16, 16, 10)).astype(np.int16)
    nrrd_io.write(d / "s.nrrd", vol, header={"spacings": (0.976, 0.976, 3)})
    cache = tmp_path / "cache"

    plain = CTScanDataset(
        str(d), size=(None, None, None), spacing=None, output_depth=12
    )
    ds = CTScanDataset(
        str(d), size=(None, None, None), spacing=None, output_depth=12,
        cache_dir=str(cache),
    )
    for reader in (
        lambda s, i: s[i],
        lambda s, i: s.get_folded(i, 2),
    ):
        want_v, want_n = reader(plain, 0)
        got1 = reader(ds, 0)  # miss: compute + write
        got2 = reader(ds, 0)  # hit: read back
        for got in (got1, got2):
            np.testing.assert_array_equal(got[0], want_v)
            assert got[1] == want_n
    assert len(list(cache.glob("*.npz"))) == 2  # one per fold key

    # stale invalidation: rewriting the scan changes size/mtime → new key
    vol2 = rng.integers(-1200, 2800, size=(16, 16, 11)).astype(np.int16)
    nrrd_io.write(d / "s.nrrd", vol2, header={"spacings": (0.976, 0.976, 3)})
    ds2 = CTScanDataset(
        str(d), size=(None, None, None), spacing=None, output_depth=12,
        cache_dir=str(cache),
    )
    plain2 = CTScanDataset(
        str(d), size=(None, None, None), spacing=None, output_depth=12
    )
    np.testing.assert_array_equal(ds2[0][0], plain2[0][0])
