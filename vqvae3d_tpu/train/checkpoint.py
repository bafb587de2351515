"""Orbax checkpointing + reference-checkpoint conversion.

The reference leans on PyTorch Lightning: ``save_hyperparameters`` makes
checkpoints self-describing (vqvae/model.py:42, pixelcnn.py:30) and
ModelCheckpoint keeps top-1 + last (vqvae/train.py:56). TPU equivalents:

  * ``save_checkpoint`` / ``restore_checkpoint`` — Orbax save of the whole
    train-state pytree (params, optimizer, EMA codebooks) plus a JSON
    config snapshot so ``load_model`` can rebuild the model with no args.
  * ``CheckpointManagerWrapper`` — best-k + last retention on a monitored
    metric.
  * ``convert_reference_vqvae_state_dict`` — maps a torch VQVAE state_dict
    (NCDHW conv weights, fixup scalars, quantizer buffers) onto our
    channels-last variable tree, enabling SSIM-parity evaluation against
    published reference checkpoints (BASELINE.md).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _config_to_json(config) -> str:
    d = dataclasses.asdict(config)
    d["dtype"] = jnp.dtype(d["dtype"]).name if d.get("dtype") is not None else None
    return json.dumps(d)


def _config_from_json(cls, text: str):
    d = json.loads(text)
    if d.get("dtype") is not None:
        d["dtype"] = jnp.dtype(d["dtype"])
    if "num_embeddings" in d and isinstance(d["num_embeddings"], list):
        d["num_embeddings"] = tuple(d["num_embeddings"])
    return cls(**d)


def save_checkpoint(path, state, config=None, step: Optional[int] = None) -> None:
    """Save a train-state pytree (+ config JSON) to ``path``/step."""
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    step = int(step if step is not None else getattr(state, "step", 0))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / f"step_{step}", state)
    ckptr.wait_until_finished()
    if config is not None:
        (path / f"step_{step}_config.json").write_text(_config_to_json(config))
    (path / "latest.txt").write_text(str(step))


def latest_step(path) -> Optional[int]:
    f = Path(path) / "latest.txt"
    return int(f.read_text()) if f.exists() else None


def restore_checkpoint(path, target, step: Optional[int] = None):
    """Restore into the structure of ``target`` (a concrete state pytree)."""
    path = Path(path).resolve()
    if step is None:
        step = latest_step(path)
        assert step is not None, f"no checkpoint under {path}"
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path / f"step_{step}", target=target)


def load_config(path, cls, step: Optional[int] = None):
    path = Path(path)
    if step is None:
        step = latest_step(path)
    return _config_from_json(cls, (path / f"step_{step}_config.json").read_text())


# ---------------------------------------------------------------------------
# Reference (torch) checkpoint conversion
# ---------------------------------------------------------------------------

def _t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv3d weight (O, I, kD, kH, kW) → (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def convert_reference_vqvae_state_dict(
    state_dict: Dict[str, np.ndarray], config
) -> Dict[str, Any]:
    """Convert a reference VQVAE torch state_dict into our variable tree.

    Input keys look like ``encoder.down.0.layers.0.branch_conv1.weight`` /
    ``encoder.quantize.0.embed`` (see /root/reference/vqvae/layers.py for
    module structure). Returns {'params': ..., 'quantizer': ...} matching
    models.vqvae.VQVAE naming. Tensors must already be numpy (call
    ``{k: v.cpu().numpy() for k, v in sd.items()}`` on the torch side).
    """
    n_enc = config.n_bottleneck_blocks
    n_down = config.n_blocks_per_bottleneck
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    quantizer: Dict[str, Any] = {"encoder": {}}

    def put(tree, dotted, value):
        parts = dotted.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def conv_entry(dst_tree, dst, src_prefix, bias=True):
        put(dst_tree, dst + "/kernel", _t2j_conv(state_dict[src_prefix + ".weight"]))
        if bias and src_prefix + ".bias" in state_dict:
            put(dst_tree, dst + "/bias", state_dict[src_prefix + ".bias"])

    def fixup_block(dst_tree, dst, src_prefix, mode):
        """PreActFixupResBlock params (the default block type)."""
        for name in ("1a", "1b", "2a", "2b", "3a", "3b", "4"):
            put(dst_tree, f"{dst}/bias{name}", state_dict[f"{src_prefix}.bias{name}"])
        put(dst_tree, f"{dst}/scale", state_dict[f"{src_prefix}.scale"])
        for i in (1, 3):
            conv_entry(
                dst_tree, f"{dst}/branch_conv{i}", f"{src_prefix}.branch_conv{i}",
                bias=False,
            )
        # branch_conv2 is ResizeConv3D for 'up' mode → nested under /conv
        b2 = f"{dst}/branch_conv2" + ("/conv" if mode == "up" else "")
        conv_entry(dst_tree, b2, f"{src_prefix}.branch_conv2", bias=False)
        if f"{src_prefix}.skip_conv.weight" in state_dict:
            put(dst_tree, f"{dst}/bias1c", state_dict[f"{src_prefix}.bias1c"])
            put(dst_tree, f"{dst}/bias1d", state_dict[f"{src_prefix}.bias1d"])
            skip = f"{dst}/skip_conv" + ("/conv" if mode == "up" else "")
            conv_entry(dst_tree, skip, f"{src_prefix}.skip_conv", bias=False)

    def upblock(dst_tree, dst, src_prefix, n_up, n_post):
        """UpBlock: torch Sequential index ↔ our (up_i, up_i_post_j)."""
        seq = 0
        for i in range(n_up - 1, -1, -1):
            fixup_block(dst_tree, f"{dst}/up_{i}", f"{src_prefix}.layers.{seq}", "up")
            seq += 1
            for j in range(n_post):
                fixup_block(
                    dst_tree,
                    f"{dst}/up_{i}_post_{j}",
                    f"{src_prefix}.layers.{seq}",
                    "same",
                )
                seq += 1

    enc = params["encoder"]
    conv_entry(enc, "parse_input", "encoder.parse_input")

    for lvl in range(n_enc):
        # DownBlock
        seq = 0
        for i in range(n_down):
            fixup_block(
                enc,
                f"down_{lvl}/down_{i}",
                f"encoder.down.{lvl}.layers.{seq}",
                "down",
            )
            seq += 1
            for j in range(config.n_post_downscale_blocks):
                fixup_block(
                    enc,
                    f"down_{lvl}/down_{i}_post_{j}",
                    f"encoder.down.{lvl}.layers.{seq}",
                    "same",
                )
                seq += 1

        # PreQuantizationConditioning
        pqc_src = f"encoder.pre_quantize_cond.{lvl}"
        pqc_dst = f"pre_quantize_cond_{lvl}"
        if f"{pqc_src}.proj.weight" in state_dict:
            conv_entry(enc, f"{pqc_dst}/proj", f"{pqc_src}.proj")
            upblock(
                enc,
                f"{pqc_dst}/upsample",
                f"{pqc_src}.upsample",
                n_down,
                config.n_post_upscale_blocks,
            )
        fixup_block(enc, f"{pqc_dst}/pre_q", f"{pqc_src}.pre_q", "same")

        # pre-quantize 'same' stacks
        for j in range(config.n_pre_quantization_blocks):
            fixup_block(
                enc,
                f"pre_quantize_{lvl}_{j}",
                f"encoder.pre_quantize.{lvl}.{j}",
                "same",
            )

        # Quantizer buffers
        q = f"encoder.quantize.{lvl}"
        quantizer["encoder"][f"quantize_{lvl}"] = {
            "embed": jnp.asarray(state_dict[f"{q}.embed"]),
            "embed_avg": jnp.asarray(state_dict[f"{q}.embed_avg"]),
            "cluster_size": jnp.asarray(state_dict[f"{q}.cluster_size"]),
            "initialized": jnp.asarray(
                np.asarray(state_dict[f"{q}.first_pass"]) == 0
            ),
        }

    dec = params["decoder"]
    for lvl in range(n_enc):
        if lvl != n_enc - 1:
            # reference stores proj as a ModuleList indexed fine→...; our
            # proj_{lvl} maps to decoder.proj[lvl] (both fine-first)
            conv_entry(dec, f"proj_{lvl}", f"decoder.proj.{lvl}")
        # up[lvl] = Sequential(post_q blocks ..., UpBlock)
        for j in range(config.n_post_quantization_blocks):
            fixup_block(
                dec,
                f"post_quantize_{lvl}_{j}",
                f"decoder.up.{lvl}.{j}",
                "same",
            )
        upblock(
            dec,
            f"up_{lvl}",
            f"decoder.up.{lvl}.{config.n_post_quantization_blocks}",
            n_down,
            config.n_post_upscale_blocks,
        )
    conv_entry(dec, "out", "decoder.out")

    return {"params": params, "quantizer": quantizer}
