"""torch-safetensors <-> gtax parameter-pytree porting.

The reference ships three torch checkpoints (dit.safetensors,
dit_action.safetensors, vit-l-20.safetensors on HF Iker/AI-Generated-GTA-V —
reference README.md:71, generate.py:82-90). This module loads them unchanged
into gtax param trees, and exports gtax trees back into torch-layout
safetensors so checkpoints round-trip into the reference ecosystem.

Layout mappings (torch -> gtax):
  - nn.Linear weight (out, in)            -> kernel (in, out)        [transpose]
  - patch-embed Conv2d weight (D, C, p, p)-> kernel (C*p*p, D)       [reshape+T]
  - per-block tensors blocks.{i}.X        -> stacked on leading axis i
  - rotary freqs nn.Parameters            -> {spatial,temporal}_rope_freqs

Like the reference loaders (generate.py:28-47, train_dit.py:212-219), loading
reports missing/unexpected keys instead of failing hard — the shipped
no-action DiT checkpoint still contains external_cond weights
(reference quirk, model/dit.py:388).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gtax.models.dit import DiTConfig
from gtax.models.vae import VAEConfig


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors file into numpy arrays (bf16 upcast to fp32)."""
    try:
        from safetensors.numpy import load_file

        return dict(load_file(path))
    except Exception:
        # numpy loader cannot represent bf16; go through torch.
        from safetensors.torch import load_file as load_torch

        return {
            k: v.to(dtype=_torch().float32).numpy() if v.dtype == _torch().bfloat16
            else v.numpy()
            for k, v in load_torch(path).items()
        }


def write_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)


def _torch():
    import torch

    return torch


def _t(x):  # torch Linear weight -> gtax kernel
    return np.asarray(x, dtype=np.float32).T


def _conv_kernel(x):  # (D, C, p, p) -> (C*p*p, D)
    x = np.asarray(x, dtype=np.float32)
    return x.reshape(x.shape[0], -1).T


# ----------------------------------------------------------------- DiT

_DIT_BLOCK_LIN = {
    # gtax path inside a block -> (torch suffix, has_bias)
    ("s_adaln",): ("s_adaLN_modulation.1", True),
    ("s_attn", "qkv"): ("s_attn.to_qkv", False),
    ("s_attn", "out"): ("s_attn.to_out", True),
    ("s_mlp", "fc1"): ("s_mlp.fc1", True),
    ("s_mlp", "fc2"): ("s_mlp.fc2", True),
    ("t_adaln",): ("t_adaLN_modulation.1", True),
    ("t_attn", "qkv"): ("t_attn.to_qkv", False),
    ("t_attn", "out"): ("t_attn.to_out", True),
    ("t_mlp", "fc1"): ("t_mlp.fc1", True),
    ("t_mlp", "fc2"): ("t_mlp.fc2", True),
}


def dit_from_torch(state: dict[str, np.ndarray], cfg: DiTConfig):
    """Build a gtax DiT param tree from a torch state_dict. Returns
    (params, missing_keys, unexpected_keys)."""
    used: set[str] = set()
    missing: list[str] = []

    def take(key, fn=lambda x: np.asarray(x, dtype=np.float32)):
        if key not in state:
            missing.append(key)
            return None
        used.add(key)
        return jnp.asarray(fn(state[key]))

    def take_rope(canonical, alias_substr, analytic):
        """The rotary freq nn.Parameters are shared across modules; safetensors
        dedup may keep any alias (e.g. blocks.0.s_attn.rotary_emb.freqs).
        Fall back to the analytic table if none survives."""
        if canonical in state:
            return take(canonical)
        for k in sorted(state):
            if alias_substr in k:
                used.add(k)
                return jnp.asarray(np.asarray(state[k], dtype=np.float32))
        return analytic

    from gtax.core import rope as _rope

    params = {
        "patch_embed": {
            "kernel": take("x_embedder.proj.weight", _conv_kernel),
            "bias": take("x_embedder.proj.bias"),
        },
        "t_embedder": {
            "fc1": {"kernel": take("t_embedder.mlp.0.weight", _t),
                    "bias": take("t_embedder.mlp.0.bias")},
            "fc2": {"kernel": take("t_embedder.mlp.2.weight", _t),
                    "bias": take("t_embedder.mlp.2.bias")},
        },
        "spatial_rope_freqs": take_rope(
            "spatial_rotary_emb.freqs", "s_attn.rotary_emb.freqs",
            _rope.pixel_freqs(cfg.head_dim // 2, max_freq=256.0),
        ),
        "temporal_rope_freqs": take_rope(
            "temporal_rotary_emb.freqs", "t_attn.rotary_emb.freqs",
            _rope.lang_freqs(cfg.head_dim),
        ),
        "final": {
            "adaln": {"kernel": take("final_layer.adaLN_modulation.1.weight", _t),
                      "bias": take("final_layer.adaLN_modulation.1.bias")},
            "linear": {"kernel": take("final_layer.linear.weight", _t),
                       "bias": take("final_layer.linear.bias")},
        },
    }
    if cfg.external_cond_dim > 0:
        if "external_cond.weight" in state:
            params["external_cond"] = {
                "kernel": take("external_cond.weight", _t),
                "bias": take("external_cond.bias"),
            }
        else:
            # report it (load_dit prints the diff) instead of silently
            # shipping a tree that KeyErrors on the first action-conditioned
            # forward; forwards without actions still work
            missing.extend(["external_cond.weight", "external_cond.bias"])

    blocks: dict = {}
    for path, (suffix, has_bias) in _DIT_BLOCK_LIN.items():
        ws, bs = [], []
        for i in range(cfg.depth):
            w = take(f"blocks.{i}.{suffix}.weight", _t)
            ws.append(w)
            if has_bias:
                bs.append(take(f"blocks.{i}.{suffix}.bias"))
        node: dict = {"kernel": jnp.stack(ws)} if None not in ws else {}
        if has_bias and None not in bs:
            node["bias"] = jnp.stack(bs)
        cur = blocks
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = node
    params["blocks"] = blocks

    unexpected = sorted(set(state) - used)
    # external_cond in an action-free load is expected-unexpected (ref quirk 8)
    return params, missing, unexpected


def dit_to_torch(params, cfg: DiTConfig) -> dict[str, np.ndarray]:
    """Inverse mapping: gtax DiT tree -> torch-layout state_dict arrays.
    Accepts either block layout (stacked (depth, ...) arrays or the
    unstack_train tuple of per-block pytrees — restacked here)."""
    if isinstance(params.get("blocks"), (tuple, list)):
        from gtax.models.dit import restack_params

        params = restack_params(params, cfg)
    out: dict[str, np.ndarray] = {}

    def put(key, x):
        out[key] = np.asarray(x, dtype=np.float32)

    pe = params["patch_embed"]
    D = cfg.hidden_size
    put(
        "x_embedder.proj.weight",
        np.asarray(pe["kernel"], np.float32).T.reshape(
            D, cfg.in_channels, cfg.patch_size, cfg.patch_size
        ),
    )
    put("x_embedder.proj.bias", pe["bias"])
    put("t_embedder.mlp.0.weight", np.asarray(params["t_embedder"]["fc1"]["kernel"]).T)
    put("t_embedder.mlp.0.bias", params["t_embedder"]["fc1"]["bias"])
    put("t_embedder.mlp.2.weight", np.asarray(params["t_embedder"]["fc2"]["kernel"]).T)
    put("t_embedder.mlp.2.bias", params["t_embedder"]["fc2"]["bias"])
    put("spatial_rotary_emb.freqs", params["spatial_rope_freqs"])
    put("temporal_rotary_emb.freqs", params["temporal_rope_freqs"])
    if "external_cond" in params:
        put("external_cond.weight", np.asarray(params["external_cond"]["kernel"]).T)
        put("external_cond.bias", params["external_cond"]["bias"])
    put("final_layer.adaLN_modulation.1.weight",
        np.asarray(params["final"]["adaln"]["kernel"]).T)
    put("final_layer.adaLN_modulation.1.bias", params["final"]["adaln"]["bias"])
    put("final_layer.linear.weight", np.asarray(params["final"]["linear"]["kernel"]).T)
    put("final_layer.linear.bias", params["final"]["linear"]["bias"])

    for path, (suffix, has_bias) in _DIT_BLOCK_LIN.items():
        node = params["blocks"]
        for p in path:
            node = node[p]
        for i in range(cfg.depth):
            put(f"blocks.{i}.{suffix}.weight", np.asarray(node["kernel"][i]).T)
            if has_bias:
                put(f"blocks.{i}.{suffix}.bias", node["bias"][i])
    return out


# ----------------------------------------------------------------- VAE

_VAE_TOP = {
    # gtax path -> (torch key base, kind)
    ("patch_embed",): ("patch_embed.proj", "conv"),
    ("enc_norm",): ("enc_norm", "ln"),
    ("quant",): ("quant_conv", "lin"),
    ("post_quant",): ("post_quant_conv", "lin"),
    ("dec_norm",): ("dec_norm", "ln"),
    ("predictor",): ("predictor", "lin"),
}

_VAE_BLOCK = {
    ("norm1",): ("norm1", "ln"),
    ("attn", "qkv"): ("attn.qkv", "lin"),
    ("attn", "out"): ("attn.proj", "lin"),
    ("norm2",): ("norm2", "ln"),
    ("mlp", "fc1"): ("mlp.fc1", "lin"),
    ("mlp", "fc2"): ("mlp.fc2", "lin"),
}


def vae_from_torch(state: dict[str, np.ndarray], cfg: VAEConfig):
    used: set[str] = set()
    missing: list[str] = []

    def take(key, fn=lambda x: np.asarray(x, dtype=np.float32)):
        if key not in state:
            missing.append(key)
            return None
        used.add(key)
        return jnp.asarray(fn(state[key]))

    def node_for(base, kind):
        if kind == "conv":
            return {"kernel": take(f"{base}.weight", _conv_kernel),
                    "bias": take(f"{base}.bias")}
        if kind == "lin":
            return {"kernel": take(f"{base}.weight", _t),
                    "bias": take(f"{base}.bias")}
        return {"weight": take(f"{base}.weight"), "bias": take(f"{base}.bias")}

    params: dict = {}
    for path, (base, kind) in _VAE_TOP.items():
        cur = params
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = node_for(base, kind)

    for name, depth in (("encoder", cfg.enc_depth), ("decoder", cfg.dec_depth)):
        blocks: dict = {}
        for path, (suffix, kind) in _VAE_BLOCK.items():
            leaves: dict[str, list] = {}
            for i in range(depth):
                node = node_for(f"{name}.{i}.{suffix}", kind)
                for k, v in node.items():
                    leaves.setdefault(k, []).append(v)
            stacked = {
                k: jnp.stack(v) for k, v in leaves.items() if None not in v
            }
            cur = blocks
            for p in path[:-1]:
                cur = cur.setdefault(p, {})
            cur[path[-1]] = stacked
        params[name] = blocks

    unexpected = sorted(set(state) - used)
    return params, missing, unexpected


def vae_to_torch(params, cfg: VAEConfig) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def emit(base, kind, node, idx=None):
        sel = (lambda x: np.asarray(x[idx])) if idx is not None else np.asarray
        if kind == "conv":
            k = sel(node["kernel"]).T
            out[f"{base}.weight"] = k.reshape(
                k.shape[0], 3, cfg.patch_size, cfg.patch_size
            ).astype(np.float32)
            out[f"{base}.bias"] = sel(node["bias"]).astype(np.float32)
        elif kind == "lin":
            out[f"{base}.weight"] = sel(node["kernel"]).T.astype(np.float32)
            out[f"{base}.bias"] = sel(node["bias"]).astype(np.float32)
        else:
            out[f"{base}.weight"] = sel(node["weight"]).astype(np.float32)
            out[f"{base}.bias"] = sel(node["bias"]).astype(np.float32)

    for path, (base, kind) in _VAE_TOP.items():
        node = params
        for p in path:
            node = node[p]
        emit(base, kind, node)
    for name, depth in (("encoder", cfg.enc_depth), ("decoder", cfg.dec_depth)):
        for path, (suffix, kind) in _VAE_BLOCK.items():
            node = params[name]
            for p in path:
                node = node[p]
            for i in range(depth):
                emit(f"{name}.{i}.{suffix}", kind, node, idx=i)
    return out


# ------------------------------------------------------------- loaders

def load_dit(path: str, cfg: DiTConfig, verbose: bool = True):
    state = strip_prefix(read_safetensors(path))
    params, missing, unexpected = dit_from_torch(state, cfg)
    if verbose and (missing or unexpected):
        print(
            f"[gtax] DiT checkpoint '{path}' key diff — "
            f"missing: {missing}\nunexpected: {unexpected}"
        )
    return params


def load_vae(path: str, cfg: VAEConfig, verbose: bool = True):
    state = strip_prefix(read_safetensors(path))
    params, missing, unexpected = vae_from_torch(state, cfg)
    if verbose and (missing or unexpected):
        print(
            f"[gtax] VAE checkpoint '{path}' key diff — "
            f"missing: {missing}\nunexpected: {unexpected}"
        )
    return params


def save_dit(path: str, params, cfg: DiTConfig) -> None:
    write_safetensors(path, dit_to_torch(params, cfg))


def save_vae(path: str, params, cfg: VAEConfig) -> None:
    write_safetensors(path, vae_to_torch(params, cfg))


def expected_dit_keys(cfg: DiTConfig) -> set[str]:
    """The torch state_dict key set of the reference DiT (for manifest tests)."""
    keys = {
        "x_embedder.proj.weight", "x_embedder.proj.bias",
        "t_embedder.mlp.0.weight", "t_embedder.mlp.0.bias",
        "t_embedder.mlp.2.weight", "t_embedder.mlp.2.bias",
        "spatial_rotary_emb.freqs", "temporal_rotary_emb.freqs",
        "final_layer.adaLN_modulation.1.weight",
        "final_layer.adaLN_modulation.1.bias",
        "final_layer.linear.weight", "final_layer.linear.bias",
    }
    if cfg.external_cond_dim > 0:
        keys |= {"external_cond.weight", "external_cond.bias"}
    for i in range(cfg.depth):
        for suffix, has_bias in _DIT_BLOCK_LIN.values():
            keys.add(f"blocks.{i}.{suffix}.weight")
            if has_bias:
                keys.add(f"blocks.{i}.{suffix}.bias")
    return keys


def strip_prefix(state: dict[str, np.ndarray], prefix: str = "module.") -> dict:
    """Drop a DDP/compile wrapper prefix if present (accelerate unwraps before
    saving in the reference, but tolerate wrapped checkpoints)."""
    if state and all(k.startswith(prefix) for k in state):
        return {k[len(prefix):]: v for k, v in state.items()}
    return state
