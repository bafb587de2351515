"""Orbax checkpointing + reference-checkpoint conversion.

The reference leans on PyTorch Lightning: ``save_hyperparameters`` makes
checkpoints self-describing (vqvae/model.py:42, pixelcnn.py:30) and
ModelCheckpoint keeps top-1 + last (vqvae/train.py:56). TPU equivalents:

  * ``save_checkpoint`` / ``restore_checkpoint`` — Orbax save of the whole
    train-state pytree (params, optimizer, EMA codebooks) plus a JSON
    config snapshot so ``load_model`` can rebuild the model with no args.
    ``max_to_keep`` prunes older step dirs after each save, reproducing the
    reference's top-1 + save_last retention (two dirs: the CLI's main
    ckpt-dir holds the last checkpoint, its ``best/`` subdir the best one).
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


def save_checkpoint(
    path,
    state,
    config=None,
    step: Optional[int] = None,
    max_to_keep: Optional[int] = None,
) -> None:
    """Save a train-state pytree (+ config JSON) to ``path``/step.

    ``max_to_keep``: if set, prune all but the newest N ``step_*`` dirs after
    a successful save (reference keeps top-1 + last, vqvae/train.py:56;
    round-1 left this unbounded — every validation added a full new copy).
    """
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    step = int(step if step is not None else getattr(state, "step", 0))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / f"step_{step}", state, force=True)
    ckptr.wait_until_finished()
    if config is not None:
        (path / f"step_{step}_config.json").write_text(_config_to_json(config))
    (path / "latest.txt").write_text(str(step))
    if max_to_keep is not None:
        _prune_checkpoints(path, max_to_keep)


def _prune_checkpoints(path: Path, keep: int) -> None:
    """Delete all but the newest ``keep`` step_* checkpoint dirs under path."""
    import shutil

    steps = sorted(
        int(p.name[len("step_"):])
        for p in path.glob("step_*")
        if p.is_dir() and p.name[len("step_"):].isdigit()
    )
    for s in steps[: max(0, len(steps) - keep)]:
        shutil.rmtree(path / f"step_{s}", ignore_errors=True)
        cfg = path / f"step_{s}_config.json"
        if cfg.exists():
            cfg.unlink()


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


def _convert_causal_block(state_dict, put, dst, src, has_cond, has_skip, has_aux=False):
    """PreActFixupCausalResBlock params (reference pixel_model/layers.py:338-497):
    7 scalar biases + scale, three CausalConv3dAdd convs (each = depth/height/
    width Conv3d), ExpandRF (depth/height 1x1x1 convs), optional condition
    conv, optional skip CausalConv3dAdd, optional aux CausalConv3dAdd."""
    for name in ("1a", "1b", "2a", "2b", "3a", "3b", "4"):
        put(f"{dst}/bias{name}", state_dict[f"{src}.bias{name}"])
    put(f"{dst}/scale", state_dict[f"{src}.scale"])
    for conv in ("branch_conv1", "branch_conv2", "branch_conv3"):
        for stream in ("depth_conv", "height_conv", "width_conv"):
            put(
                f"{dst}/{conv}/{stream}/kernel",
                _t2j_conv(state_dict[f"{src}.{conv}.{stream}.weight"]),
            )
    put(
        f"{dst}/expand_rf/depth_conv/kernel",
        _t2j_conv(state_dict[f"{src}.expand_rf.depth_conv.weight"]),
    )
    put(
        f"{dst}/expand_rf/depth_conv/bias",
        state_dict[f"{src}.expand_rf.depth_conv.bias"],
    )
    put(
        f"{dst}/expand_rf/height_conv/kernel",
        _t2j_conv(state_dict[f"{src}.expand_rf.height_conv.weight"]),
    )
    put(
        f"{dst}/expand_rf/height_conv/bias",
        state_dict[f"{src}.expand_rf.height_conv.bias"],
    )
    if has_cond and f"{src}.condition.weight" in state_dict:
        put(f"{dst}/condition/kernel", _t2j_conv(state_dict[f"{src}.condition.weight"]))
        put(f"{dst}/condition/bias", state_dict[f"{src}.condition.bias"])
    if has_skip and f"{src}.skip_conv.depth_conv.weight" in state_dict:
        for stream in ("depth_conv", "height_conv", "width_conv"):
            put(
                f"{dst}/skip_conv/{stream}/kernel",
                _t2j_conv(state_dict[f"{src}.skip_conv.{stream}.weight"]),
            )
            put(
                f"{dst}/skip_conv/{stream}/bias",
                state_dict[f"{src}.skip_conv.{stream}.bias"],
            )
    if has_aux and f"{src}.aux.depth_conv.weight" in state_dict:
        for stream in ("depth_conv", "height_conv", "width_conv"):
            put(
                f"{dst}/aux/{stream}/kernel",
                _t2j_conv(state_dict[f"{src}.aux.{stream}.weight"]),
            )
            put(
                f"{dst}/aux/{stream}/bias",
                state_dict[f"{src}.aux.{stream}.bias"],
            )


def convert_reference_pixelcnn_state_dict(state_dict, config):
    """Convert a reference PixelCNN torch state_dict (pixel_model/pixelcnn.py
    module tree: parse_input / embed_condition / layers.N / parse_output)
    into our PixelCNN variable tree. Requires the default
    PreActFixupCausalResBlock configuration."""
    params: Dict[str, Any] = {}

    def put(dotted, value):
        parts = dotted.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    put("parse_input/kernel", _t2j_conv(state_dict["parse_input.weight"]))
    put("parse_input/bias", state_dict["parse_input.bias"])
    if "embed_condition.weight" in state_dict and config.use_conditioning:
        put("embed_condition/kernel", _t2j_conv(state_dict["embed_condition.weight"]))
        put("embed_condition/bias", state_dict["embed_condition.bias"])
    for i in range(config.num_resblocks + 1):
        _convert_causal_block(
            state_dict,
            put,
            f"layer_{i}",
            f"layers.{i}",
            has_cond=config.use_conditioning,
            has_skip=True,
        )
    put("parse_output/kernel", _t2j_conv(state_dict["parse_output.weight"]))
    put("parse_output/bias", state_dict["parse_output.bias"])
    return {"params": params}


def convert_reference_pixelsnail_state_dict(state_dict, config):
    """Convert a reference PixelSNAIL torch state_dict (pixelsnail.py module
    tree: parse_input / embed_condition / to_causal / layers.N
    (CausalAttentionPixelBlock: causal_layers.M, key_value_proj, query_proj,
    out_proj) / parse_output) into our PixelSNAIL variable tree."""
    params: Dict[str, Any] = {}

    def put(dotted, value):
        parts = dotted.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    put("parse_input/kernel", _t2j_conv(state_dict["parse_input.weight"]))
    put("parse_input/bias", state_dict["parse_input.bias"])
    if "embed_condition.weight" in state_dict and config.use_conditioning:
        put("embed_condition/kernel", _t2j_conv(state_dict["embed_condition.weight"]))
        put("embed_condition/bias", state_dict["embed_condition.bias"])

    _convert_causal_block(
        state_dict, put, "to_causal", "to_causal",
        has_cond=config.use_conditioning, has_skip=True,
    )
    for i in range(config.num_blocks):
        blk_src = f"layers.{i}"
        blk_dst = f"block_{i}"
        for j in range(config.num_layers_per_block):
            _convert_causal_block(
                state_dict,
                put,
                f"{blk_dst}/causal_{j}",
                f"{blk_src}.causal_layers.{j}",
                has_cond=config.use_conditioning,
                has_skip=True,
            )
        for proj in ("key_value_proj", "query_proj"):
            for stream in ("depth_conv", "height_conv", "width_conv"):
                put(
                    f"{blk_dst}/{proj}/{stream}/kernel",
                    _t2j_conv(state_dict[f"{blk_src}.{proj}.{stream}.weight"]),
                )
                put(
                    f"{blk_dst}/{proj}/{stream}/bias",
                    state_dict[f"{blk_src}.{proj}.{stream}.bias"],
                )
        _convert_causal_block(
            state_dict,
            put,
            f"{blk_dst}/out_proj",
            f"{blk_src}.out_proj",
            has_cond=config.use_conditioning,
            has_skip=True,
            has_aux=True,
        )
    put("parse_output/kernel", _t2j_conv(state_dict["parse_output.weight"]))
    put("parse_output/bias", state_dict["parse_output.bias"])
    return {"params": params}


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
    assert config.stem_space_to_depth == 1, (
        "reference checkpoints have no space-to-depth stem"
    )
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
