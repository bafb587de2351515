"""CT scan dataset + batched, prefetching data module.

Re-designs /root/reference/utils/load_nrrd_dataset.py for a JAX host
pipeline:

  * ``CTScanDataset`` — globs ``**/*.nrrd``, header-filters scans by exact
    (H, W) size and voxel spacing with warnings (reference :130-155), reads
    volumes as float32 and applies the transform chain: HU window/scale/
    shift → depth pad+valid-slice label → optional area rescale
    (reference :75-86; DepthPadAndCrop must run before the rescale).
  * ``CTDataModule`` — seeded 95/5 train/val split (reference :90-94),
    shuffled, drop-last batch iteration with a background thread pool for
    decode + a one-batch prefetch queue feeding device transfers (replaces
    torch DataLoader(num_workers=5, pin_memory) — reference :105-109).

Batches are dicts {'volume': (B, H, W, D, 1) f32, 'num_valid_slices': (B,)}
matching the train step contract.
"""
from __future__ import annotations

import queue
import warnings
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from vqvae3d_tpu.data import nrrd_io
from vqvae3d_tpu.data.transforms import depth_pad_and_crop, hu_window_normalize


class CTScanDataset:
    """NRRD CT volumes with header-based compatibility filtering."""

    def __init__(
        self,
        root: str,
        size: Tuple[Optional[int], Optional[int], Optional[int]] = (512, 512, None),
        spacing: Optional[Tuple[float, float, float]] = (0.976, 0.976, 3),
        ext: str = ".nrrd",
        output_depth: int = 128,
        rescale_input: Optional[Tuple[int, int, int]] = None,
        cache_dir: Optional[str] = None,
    ):
        scans = sorted(str(p) for p in Path(root).glob(f"**/*{ext}"))
        keep = []
        for scan in scans:
            try:
                header = nrrd_io.read_header(scan)
            except Exception as e:  # unreadable file
                warnings.warn(f"Skipping unreadable scan {scan}: {e}")
                continue
            sizes = header["sizes"]
            ok = True
            for want, got in zip(size, sizes):
                if want is not None and int(got) != want:
                    warnings.warn(
                        f"Scan {scan} size {tuple(sizes)} doesn't match {size}; ignoring"
                    )
                    ok = False
                    break
            if ok and spacing is not None:
                sp = _header_spacing(header)
                if sp is None or not np.allclose(sp, spacing, atol=1e-3):
                    warnings.warn(
                        f"Scan {scan} spacing {sp} doesn't match {spacing}; ignoring"
                    )
                    ok = False
            if ok:
                keep.append(scan)
        self.scans = keep
        self.output_depth = output_depth
        self.rescale_input = tuple(rescale_input) if rescale_input else None
        # Decode-once volume cache (r5, VERDICT r4 #6): preprocessed
        # volumes (decoded, padded, optionally folded, normalized fp32 —
        # BIT-IDENTICAL to the uncached path) are written to ``cache_dir``
        # on first read; later epochs pay only a raw read instead of
        # gzip inflate + fold + normalize (~4.9 s/vol/core at 512-res,
        # PERF.md). The TPU-native analog of the reference's node-local
        # scratch staging (slurm-jobs/train_vqvae_3d.job:93-96). Enable
        # with cache_dir= or VQVAE3D_VOLUME_CACHE=<dir>; uncompressed
        # .npz keyed by (name, size, mtime, depth, fold) so stale entries
        # self-invalidate. Off for rescaled datasets (rescale changes the
        # output; keep the key space simple).
        import os as _os

        self.cache_dir = cache_dir or _os.environ.get("VQVAE3D_VOLUME_CACHE")
        if self.cache_dir and self.rescale_input is None:
            Path(self.cache_dir).mkdir(parents=True, exist_ok=True)
        else:
            self.cache_dir = None

    def _cache_path(self, index: int, fold: int) -> Path:
        import os as _os

        scan = self.scans[index]
        st = _os.stat(scan)
        key = (
            f"{Path(scan).stem}_{st.st_size}_{int(st.st_mtime)}"
            f"_d{self.output_depth}_f{fold}"
        )
        return Path(self.cache_dir) / f"{key}.npz"

    def _cache_read(self, index: int, fold: int):
        if not self.cache_dir:
            return None
        p = self._cache_path(index, fold)
        if not p.exists():
            return None
        try:
            with np.load(p) as z:
                return z["vol"], int(z["num_valid"])
        except Exception:  # truncated/corrupt entry: recompute + rewrite
            return None

    def _cache_write(self, index: int, fold: int, vol, num_valid: int):
        if not self.cache_dir:
            return
        import os as _os
        import tempfile as _tempfile

        p = self._cache_path(index, fold)
        fd, tmp = _tempfile.mkstemp(dir=str(p.parent), suffix=".tmp")
        try:
            with _os.fdopen(fd, "wb") as f:
                np.savez(f, vol=vol, num_valid=np.int32(num_valid))
            _os.replace(tmp, p)  # atomic: concurrent workers never see partial
        except Exception:
            try:
                _os.unlink(tmp)
            except OSError:
                pass

    def __len__(self) -> int:
        return len(self.scans)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        """→ (volume (H, W, D, 1) float32 normalized, num_valid_slices)."""
        cached = self._cache_read(index, 1)
        if cached is not None:
            return cached
        data, _ = nrrd_io.read(self.scans[index])
        vol = hu_window_normalize(data)
        vol, num_valid = depth_pad_and_crop(vol, self.output_depth)
        if self.rescale_input is not None:
            vol = _area_rescale_np(vol, self.rescale_input)
        vol = vol[..., None]
        self._cache_write(index, 1, vol, num_valid)
        return vol, num_valid

    def get_folded(self, index: int, fold: int) -> Tuple[np.ndarray, int]:
        """Fused decode → pad → s2d-fold → normalize fast path:
        (H/f, W/f, D/f, f³) float32, num_valid_slices.

        Bit-identical to ``fold_volume_np(self[index][0][None], f)[0]``
        (the HU normalize is voxel-pointwise, so it commutes exactly with
        the fold permutation; int16→f32 is exact), but the pad and the
        fold transpose run in the int16 domain BEFORE the float32
        expansion — ~2.5× less memory moved per volume, which is the
        loader's per-core ceiling (tools/bench_loader.py). Only for
        un-rescaled volumes (the rescale path averages across the fold
        boundary)."""
        assert self.rescale_input is None
        cached = self._cache_read(index, fold)
        if cached is not None:
            return cached
        data, _ = nrrd_io.read(self.scans[index])
        h, w, d = data.shape
        od = self.output_depth
        num_valid = min(d, od)
        padded = np.zeros((h, w, od), dtype=data.dtype)
        padded[:, :, :num_valid] = data[:, :, :num_valid]
        f = fold
        v = padded.reshape(h // f, f, w // f, f, od // f, f)
        v = np.ascontiguousarray(v.transpose(0, 2, 4, 1, 3, 5)).reshape(
            h // f, w // f, od // f, f**3
        )
        vol = hu_window_normalize(v)
        if num_valid < od:
            # the reference pads AFTER normalize (pad value 0.0 in
            # normalized space, not normalize(0 HU) = 1.0): zero the
            # padded depth slices — folded channel ch holds full-res
            # depth phase pd = ch % f (channel order (ph, pw, pd, c))
            dc = np.arange(od // f)[:, None]
            pd = np.arange(f**3)[None, :] % f
            vol[:, :, (dc * f + pd) >= num_valid] = 0.0
        self._cache_write(index, fold, vol, num_valid)
        return vol, num_valid


def _header_spacing(header) -> Optional[np.ndarray]:
    if "space directions" in header:
        sd = np.asarray(header["space directions"], dtype=np.float64)
        return np.array([sd[i, i] for i in range(min(3, sd.shape[0]))])
    if "spacings" in header:
        return np.asarray(header["spacings"], dtype=np.float64)
    return None


def _adaptive_avg_matrix_np(in_dim: int, out_dim: int) -> np.ndarray:
    """(out_dim, in_dim) torch-adaptive-avg-pool bin-averaging matrix."""
    m = np.zeros((out_dim, in_dim), np.float32)
    for i in range(out_dim):
        start = (i * in_dim) // out_dim
        end = -(-((i + 1) * in_dim) // out_dim)
        m[i, start:end] = 1.0 / (end - start)
    return m


def _area_rescale_np(vol: np.ndarray, size: Sequence[int]) -> np.ndarray:
    """Host-side area downscale, torch F.interpolate(mode='area') semantics.

    Integer shrink factors take the fused reshape-mean path; arbitrary sizes
    fall back to separable adaptive-average-pool matmuls (the reference's
    Interpolate accepted any size, utils/load_nrrd_dataset.py:47)."""
    h, w, d = vol.shape
    th, tw, td = size
    if (th, tw, td) == (h, w, d):
        return vol
    if h % th == 0 and w % tw == 0 and d % td == 0:
        fh, fw, fd = h // th, w // tw, d // td
        return (
            vol.reshape(th, fh, tw, fw, td, fd).mean(axis=(1, 3, 5)).astype(vol.dtype)
        )
    out = vol.astype(np.float32)
    for axis, (in_dim, out_dim) in enumerate(((h, th), (w, tw), (d, td))):
        if in_dim == out_dim:
            continue
        assert in_dim >= out_dim, f"area rescale only downscales ({in_dim}->{out_dim})"
        mat = _adaptive_avg_matrix_np(in_dim, out_dim)
        out = np.moveaxis(np.tensordot(mat, out, axes=(1, axis)), 0, axis)
    return out.astype(vol.dtype)


def fold_volume_np(vols: np.ndarray, factor: int) -> np.ndarray:
    """Host-side space_to_depth: (B, H, W, D, C) → (B, H/f, W/f, D/f, C·f³).

    Bit-identical to ops/resize.space_to_depth (tested in tests/test_data.py)
    so pre-folded batches feed the model's ``folded_io`` path exactly."""
    if factor == 1:
        return vols
    b, h, w, d, c = vols.shape
    f = factor
    assert h % f == 0 and w % f == 0 and d % f == 0, (vols.shape, f)
    v = vols.reshape(b, h // f, f, w // f, f, d // f, f, c)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return np.ascontiguousarray(v).reshape(b, h // f, w // f, d // f, f**3 * c)


def unfold_volume_np(vols: np.ndarray, factor: int) -> np.ndarray:
    """Host-side depth_to_space: inverse of ``fold_volume_np``.

    (B, H, W, D, C·f³) → (B, H·f, W·f, D·f, C). Used by the literal-stem
    folded serving path (decode/plot CLIs) to unfold device outputs at IO
    time instead of materializing full-res C=1 tensors on device."""
    if factor == 1:
        return vols
    b, h, w, d, cf = vols.shape
    f = factor
    c = cf // f**3
    assert c * f**3 == cf, (vols.shape, f)
    v = vols.reshape(b, h, w, d, f, f, f, c)
    v = v.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return np.ascontiguousarray(v).reshape(b, h * f, w * f, d * f, c)


class CTDataModule:
    """Split + batched iteration with background decode and prefetch."""

    def __init__(
        self,
        path: str,
        batch_size: int = 1,
        train_frac: float = 0.95,
        num_workers: int = 5,
        rescale_input: Optional[Tuple[int, int, int]] = None,
        seed: int = 42,
        output_depth: int = 128,
        size: Tuple[Optional[int], Optional[int], Optional[int]] = (512, 512, None),
        spacing: Optional[Tuple[float, float, float]] = (0.976, 0.976, 3),
        cache_dir: Optional[str] = None,
    ):
        assert 0 <= train_frac <= 1
        self.path = path
        self.batch_size = batch_size
        self.train_frac = train_frac
        self.num_workers = num_workers
        self.seed = seed
        self.dataset = CTScanDataset(
            path,
            size=size,
            spacing=spacing,
            output_depth=output_depth,
            rescale_input=rescale_input,
            cache_dir=cache_dir,
        )
        n = len(self.dataset)
        train_len = int(n * train_frac)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        self.train_indices = perm[:train_len]
        self.val_indices = perm[train_len:]

    def _iter(
        self,
        indices,
        shuffle: bool,
        epoch: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        fold: int = 1,
    ) -> Iterator[dict]:
        """Iterate global batches; under multi-process each process decodes
        only its contiguous slice of every global batch (the TPU-native form
        of Lightning DDP's per-rank DistributedSampler, reference
        vqvae/train.py:27). The shuffle is keyed on (seed, epoch) only, so
        all processes agree on the permutation and the union of the
        per-process slices is exactly the global batch."""
        idx = np.array(indices)
        if shuffle:
            rng = np.random.default_rng(self.seed + 1 + epoch)
            idx = rng.permutation(idx)
        bs = self.batch_size
        assert bs % process_count == 0, (bs, process_count)
        bs_local = bs // process_count
        lo = process_index * bs_local
        n_batches = len(idx) // bs  # drop_last
        if n_batches == 0:
            return

        def load_sample(i):
            # pre-fold to the stem's space-to-depth layout PER SAMPLE on
            # the decode threads: the in-jit fold of a (512,512,128,1)
            # volume is a strided relayout XLA executes at ~1/50th of HBM
            # bandwidth (~19 ms/step of core time at 512-res — PERF.md),
            # and per-sample folding scales with num_workers instead of
            # serializing per batch. Un-rescaled volumes take the fused
            # int16-domain decode→pad→fold→normalize path (~2.5× less
            # memory moved — the per-core ceiling, tools/bench_loader.py).
            if fold > 1 and self.dataset.rescale_input is None:
                return self.dataset.get_folded(int(i), fold)
            vol, nv = self.dataset[int(i)]
            if fold > 1:
                vol = fold_volume_np(vol[None], fold)[0]
            return vol, nv

        # Decode pool (samples) and a separate assembly pool (stack into
        # batches): assembly tasks BLOCK on their sample futures, so they
        # must not share the decode pool (a saturated shared pool would
        # deadlock — every worker waiting on sample tasks that can never
        # be scheduled). Prefetch scales with the worker count so all
        # workers stay busy (a fixed prefetch of 2 batches capped
        # concurrency at 2 samples for batch-size-1 runs regardless of
        # num_workers — the r3 loader's ceiling).
        prefetch = max(2, -(-max(1, self.num_workers) // bs_local) + 1)
        with ThreadPoolExecutor(
            max_workers=max(1, self.num_workers)
        ) as pool, ThreadPoolExecutor(max_workers=2) as asm:

            def submit_batch(b):
                rows = idx[b * bs + lo : b * bs + lo + bs_local]
                futs = [pool.submit(load_sample, int(i)) for i in rows]

                def assemble(futs=futs):
                    samples = [f.result() for f in futs]
                    if len(samples) == 1:
                        # view, not copy — np.stack would move another
                        # 134 MB per batch on the loader's critical path
                        vols = samples[0][0][None]
                    else:
                        vols = np.stack([s[0] for s in samples])
                    nvs = np.array([s[1] for s in samples], np.int32)
                    return {"volume": vols, "num_valid_slices": nvs}

                return asm.submit(assemble)

            futures = queue.Queue()
            for b in range(min(prefetch, n_batches)):
                futures.put(submit_batch(b))
            for b in range(n_batches):
                batch = futures.get().result()
                nxt = b + prefetch
                if nxt < n_batches:
                    futures.put(submit_batch(nxt))
                yield batch

    def train_dataloader(
        self,
        epoch: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        fold: int = 1,
    ) -> Iterator[dict]:
        return self._iter(
            self.train_indices,
            shuffle=True,
            epoch=epoch,
            process_index=process_index,
            process_count=process_count,
            fold=fold,
        )

    def val_dataloader(
        self, process_index: int = 0, process_count: int = 1
    ) -> Iterator[dict]:
        return self._iter(
            self.val_indices,
            shuffle=False,
            process_index=process_index,
            process_count=process_count,
        )

    @property
    def train_len(self) -> int:
        return len(self.train_indices)

    @property
    def val_len(self) -> int:
        return len(self.val_indices)
