"""End-to-end 5-stage pipeline test on synthetic data (SURVEY §1):

  train VQ-VAE → extract codes → train priors (coarse uncond + fine cond) →
  ancestral sampling level-by-level → decode to NRRD volumes.

Everything runs through the actual CLI mains with tiny shapes on the
virtual CPU mesh.
"""
import numpy as np
import pytest

from vqvae3d_tpu.data import nrrd_io

H = W = 32
DEPTH_PAD = 16


@pytest.fixture(scope="module")
def ct_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ct")
    rng = np.random.default_rng(0)
    for i in range(6):
        depth = int(rng.integers(10, 16))
        vol = rng.integers(-1000, 1500, size=(H, W, depth)).astype(np.int16)
        nrrd_io.write(d / f"scan{i}.nrrd", vol, header={"spacings": (0.976, 0.976, 3)})
    return d


VQVAE_ARGS = [
    "--batch-size", "2",
    "--n-bottleneck-blocks", "2",
    "--num-embeddings", "8", "16",
    "--base-network-channels", "4",
    "--max-steps", "4",
    "--val-every-steps", "2",
    "--log-every-n-steps", "1",
    "--precision", "fp32",
    "--remat", "False",
    "--scan-size", str(H), str(W),
]


@pytest.fixture(scope="module")
def pipeline_dirs(ct_dir, tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    return {
        "ct": ct_dir,
        "vqvae_ckpt": work / "vqvae_ckpt",
        "codes": work / "codes_out",
        "prior1_ckpt": work / "prior1_ckpt",
        "prior0_ckpt": work / "prior0_ckpt",
        "samples": work / "samples.db",
        "decoded": work / "decoded",
    }


def test_stage1_train_vqvae(pipeline_dirs):
    from vqvae3d_tpu.cli import train_vqvae

    args = train_vqvae.parse_arguments(
        [str(pipeline_dirs["ct"]), "--ckpt-dir", str(pipeline_dirs["vqvae_ckpt"]),
         "--output-depth", str(DEPTH_PAD)]
        + VQVAE_ARGS
    )
    state = train_vqvae.main(args)
    assert int(state.step) == 4
    assert (pipeline_dirs["vqvae_ckpt"] / "latest.txt").exists()


def test_stage2_extract(pipeline_dirs):
    from vqvae3d_tpu.cli import extract_embeddings

    args = extract_embeddings.parse_arguments([
        "--checkpoint-path", str(pipeline_dirs["vqvae_ckpt"]),
        "--dataset-path", str(pipeline_dirs["ct"]),
        "--output-path", str(pipeline_dirs["codes"].parent),
        "--output-name", pipeline_dirs["codes"].name,
        "--rescale-input", "0",
        "--scan-size", str(H), str(W),
        "--backend", "file",
        "--output-depth", str(DEPTH_PAD),
    ])
    extract_embeddings.main(args)

    from vqvae3d_tpu.data.code_store import CodeStore

    store = CodeStore(str(pipeline_dirs["codes"]))
    assert store.length == 6
    assert store.num_levels == 2
    assert store.num_embeddings == [8, 16]
    g0 = store.get(0, 0)
    g1 = store.get(0, 1)
    assert g0.shape == (H // 4, W // 4, DEPTH_PAD // 4)
    assert g1.shape == (H // 16, W // 16, DEPTH_PAD // 16)
    assert g0.max() < 8 and g1.max() < 16


PRIOR_ARGS = [
    "--model-dim", "8",
    "--kernel-size", "3",
    "--num-resblocks", "1",
    "--dropout-prob", "0.0",
    "--mixup-alpha", "0.0",
    "--batch-size", "2",
    "--max-steps", "3",
    "--val-every-steps", "2",
    "--log-every-n-steps", "1",
    "--precision", "fp32",
    "--lr", "1e-3",
]


def test_stage3_train_priors(pipeline_dirs):
    from vqvae3d_tpu.cli import train_prior

    # coarsest level (1): unconditional
    args = train_prior.parse_arguments(
        [str(pipeline_dirs["codes"]), "1",
         "--ckpt-dir", str(pipeline_dirs["prior1_ckpt"])] + PRIOR_ARGS
    )
    state = train_prior.main(args)
    assert int(state.step) == 3

    # finest level (0): conditioned on level 1
    args = train_prior.parse_arguments(
        [str(pipeline_dirs["codes"]), "0",
         "--ckpt-dir", str(pipeline_dirs["prior0_ckpt"])] + PRIOR_ARGS
    )
    state = train_prior.main(args)
    assert int(state.step) == 3


def test_stage4_sample(pipeline_dirs):
    from vqvae3d_tpu.cli import sample_embeddings

    # coarsest first (unconditional)
    args = sample_embeddings.parse_arguments([
        "--model-checkpoint", str(pipeline_dirs["prior1_ckpt"]),
        "--db-path", str(pipeline_dirs["samples"]),
        "--level", "1",
        "--size", str(H // 16), str(W // 16), str(DEPTH_PAD // 16),
        "--num-samples", "2", "--batch-size", "2",
    ])
    sample_embeddings.main(args)

    # finest, conditioned
    args = sample_embeddings.parse_arguments([
        "--model-checkpoint", str(pipeline_dirs["prior0_ckpt"]),
        "--db-path", str(pipeline_dirs["samples"]),
        "--level", "0",
        "--size", str(H // 4), str(W // 4), str(DEPTH_PAD // 4),
        "--num-samples", "2", "--batch-size", "2",
    ])
    sample_embeddings.main(args)

    from vqvae3d_tpu.data.sample_db import create_or_load_db

    db = create_or_load_db(pipeline_dirs["samples"], 0)
    assert len(db[1]) == 2 and len(db[0]) == 2
    entry = next(iter(db[0].values()))
    assert entry["condition"] in db[1]
    assert entry["data"].shape == (H // 4, W // 4, DEPTH_PAD // 4)


def test_stage3_4_pixelsnail_cli(pipeline_dirs, tmp_path_factory):
    """PixelSNAIL through the real CLI mains (VERDICT r2 missing #4):
    two-phase --use-model parsing (reference pixel_model/train.py:11-21),
    snail checkpoint round-trip, and the KV-cached snail sampler driven
    via cli/sample_embeddings.py --use-model pixelsnail --sampler cached."""
    from vqvae3d_tpu.cli import sample_embeddings, train_prior

    work = tmp_path_factory.mktemp("snail")
    ckpt = work / "snail_ckpt"
    db = work / "samples_snail.db"

    args = train_prior.parse_arguments(
        [str(pipeline_dirs["codes"]), "1",
         "--use-model", "pixelsnail",
         "--ckpt-dir", str(ckpt),
         "--model-dim", "8",
         "--kernel-size", "3",
         "--num-layers-per-block", "1",
         "--num-blocks", "1",
         "--causal-dropout-prob", "0.0",
         "--attention-dropout-prob", "0.0",
         "--num-heads", "2",
         "--mixup-alpha", "0.0",
         "--batch-size", "2",
         "--max-steps", "3",
         "--val-every-steps", "2",
         "--log-every-n-steps", "1",
         "--precision", "fp32",
         "--lr", "1e-3"]
    )
    state = train_prior.main(args)
    assert int(state.step) == 3

    args = sample_embeddings.parse_arguments([
        "--model-checkpoint", str(ckpt),
        "--db-path", str(db),
        "--level", "1",
        "--size", str(H // 16), str(W // 16), str(DEPTH_PAD // 16),
        "--num-samples", "2", "--batch-size", "2",
        "--use-model", "pixelsnail", "--sampler", "cached",
    ])
    sample_embeddings.main(args)

    from vqvae3d_tpu.data.sample_db import create_or_load_db

    out = create_or_load_db(db, 0)
    assert len(out[1]) == 2
    grid = next(iter(out[1].values()))["data"]
    assert grid.shape == (H // 16, W // 16, DEPTH_PAD // 16)
    assert grid.max() < 16


def test_stage5_decode(pipeline_dirs):
    from vqvae3d_tpu.cli import decode_embeddings

    pipeline_dirs["decoded"].mkdir(exist_ok=True)
    args = decode_embeddings.parse_arguments([
        str(pipeline_dirs["samples"]),
        str(pipeline_dirs["vqvae_ckpt"]),
        str(pipeline_dirs["decoded"] / "synth"),
        "--volume-shape", str(H), str(W), str(DEPTH_PAD),
    ])
    decode_embeddings.main(args)

    outs = list(pipeline_dirs["decoded"].glob("*.nrrd"))
    assert len(outs) == 2
    vol, header = nrrd_io.read(outs[0])
    assert vol.shape == (H, W, DEPTH_PAD)
    assert vol.dtype == np.int32
    np.testing.assert_allclose(header["spacings"], [0.976, 0.976, 3])


def test_calc_ssim_cli(pipeline_dirs):
    from vqvae3d_tpu.cli import calc_ssim_from_checkpoint

    args = calc_ssim_from_checkpoint.parse_arguments([
        str(pipeline_dirs["vqvae_ckpt"]),
        str(pipeline_dirs["ct"]),
        "--scan-size", str(H), str(W),
        "--output-depth", str(DEPTH_PAD),
    ])
    out = calc_ssim_from_checkpoint.main(args)
    assert "train" in out and -1 <= out["train"]["ssim_mean"] <= 1
