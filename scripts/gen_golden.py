"""Generate golden parity fixtures from the torch reference at /root/reference.

Runs the reference's own model code (with lightweight stubs for its missing
deps: timm's Mlp/to_2tuple and diffusers' TimestepEmbedding) on seeded random
weights and records inputs/outputs as .npz plus small torch-layout
.safetensors checkpoints. The gtax test-suite then checks bit-level agreement
of the JAX reimplementation against these fixtures WITHOUT needing the
reference at test time.

Usage:  python scripts/gen_golden.py
Writes: tests/golden/*.npz, tests/golden/*.safetensors, tests/golden/*.json
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "golden")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REPO)

from gtax.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon


def install_stubs():
    """Minimal stand-ins for timm / diffusers APIs the reference imports.

    timm.models.vision_transformer.Mlp: fc1 -> act -> fc2 (drop=0 path),
    exactly timm's module/key layout for the parts the reference uses.
    diffusers TimestepEmbedding is only referenced by an unused fallback
    path (model/embeddings.py), so an inert placeholder suffices.
    """
    import torch.nn as nn

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            hidden_features = hidden_features or in_features
            out_features = out_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit.Mlp = Mlp
    timm_layers = types.ModuleType("timm.layers")
    timm_helpers = types.ModuleType("timm.layers.helpers")
    timm_helpers.to_2tuple = to_2tuple
    import importlib.machinery

    for name, mod in [
        ("timm", timm), ("timm.models", timm_models),
        ("timm.models.vision_transformer", timm_vit),
        ("timm.layers", timm_layers), ("timm.layers.helpers", timm_helpers),
    ]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod

    class TimestepEmbedding(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    diffusers = types.ModuleType("diffusers")
    dmodels = types.ModuleType("diffusers.models")
    dembed = types.ModuleType("diffusers.models.embeddings")
    dembed.TimestepEmbedding = TimestepEmbedding
    for name, mod in [
        ("diffusers", diffusers), ("diffusers.models", dmodels),
        ("diffusers.models.embeddings", dembed),
    ]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod

    # torchvision / wandb / webdataset: imported at module top-level by the
    # reference but unused on the code paths we exercise.
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: None
    tv_io = types.ModuleType("torchvision.io")
    tv_io.write_video = lambda *a, **k: None
    tv_io.read_image = lambda *a, **k: None
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_tr.Compose = lambda *a, **k: (lambda x: x)
    tv_tr.ToTensor = lambda *a, **k: (lambda x: x)
    tv_tr.Resize = lambda *a, **k: (lambda x: x)
    for name, mod in [
        ("torchvision", tv), ("torchvision.utils", tv_utils),
        ("torchvision.io", tv_io), ("torchvision.transforms", tv_tr),
    ]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    import importlib.machinery

    wandb = types.ModuleType("wandb")
    wandb.run = None
    wandb.init = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    wandb.__spec__ = importlib.machinery.ModuleSpec("wandb", loader=None)
    sys.modules["wandb"] = wandb
    wds = types.ModuleType("webdataset")
    wds.WebDataset = object
    wds.warn_and_continue = None
    wds.shardlists = types.SimpleNamespace(split_by_worker=None)
    wds.__spec__ = importlib.machinery.ModuleSpec("webdataset", loader=None)
    sys.modules["webdataset"] = wds


def randomize_(model: torch.nn.Module, seed: int, std: float = 0.05):
    """Fill every parameter with seeded gaussian noise (sorted-key order) so
    parity fixtures exercise all weights (default init zeroes adaLN gates)."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for key in sorted(sd.keys()):
        t = sd[key]
        if t.dtype.is_floating_point:
            vals = torch.randn(t.shape, generator=gen, dtype=torch.float32) * std
            if "rotary_emb.freqs" in key or "rotary_freqs" in key:
                continue  # keep the analytic frequency tables
            t.copy_(vals)


def main():
    install_stubs()
    sys.path.insert(0, REFERENCE)
    torch.manual_seed(0)
    from safetensors.torch import save_model

    import utils as ref_utils  # noqa: E402  (reference /root/reference/utils.py)
    from model.dit import DiT  # noqa: E402
    from model.vae import AutoencoderKL  # noqa: E402
    from model.rotary_embedding_torch import RotaryEmbedding, apply_rotary_emb  # noqa: E402
    import train_dit  # noqa: E402

    # ---------------------------------------------------------- schedules
    sched = {}
    for clamp in (1e-4, 1e-6):
        betas = ref_utils.sigmoid_beta_schedule(1000, clamp_min=clamp).float()
        sched[f"sigmoid_{clamp:g}"] = betas.numpy()
        sched[f"sigmoid_{clamp:g}_abar"] = torch.cumprod(1 - betas, 0).numpy()
    sched["sigmoid_clamped"] = ref_utils.sigmoid_beta_schedule_clamped(1000).float().numpy()
    sched["sigmoid_og"] = ref_utils.sigmoid_beta_schedule_og(1000).float().numpy()
    sched["cosine"] = ref_utils.cosine_beta_schedule(1000).float().numpy()
    sched["linear"] = ref_utils.linear_beta_schedule(1000).float().numpy()
    sched["noise_range_50"] = (
        torch.linspace(0, 999, 51).long().numpy().astype(np.int32)
    )
    np.savez(os.path.join(OUT, "schedules.npz"), **sched)

    # --------------------------------------------------------------- rope
    g = torch.Generator().manual_seed(7)
    rope_out = {}
    # temporal (lang) rope: dim 64 over T=5, tensor (B*HW=6, h=4, T=5, d=64)
    rot_t = RotaryEmbedding(dim=64)
    q = torch.randn(6, 4, 5, 64, generator=g)
    rope_out["temporal_in"] = q.numpy()
    rope_out["temporal_freqs"] = rot_t.freqs.detach().numpy()
    rope_out["temporal_out"] = rot_t.rotate_queries_or_keys(q, rot_t.freqs).numpy()
    # spatial pixel axial rope: dim 32, max_freq 256 on (9,16) grid, full rot
    rot_s = RotaryEmbedding(dim=32, freqs_for="pixel", max_freq=256)
    sfreqs = rot_s.get_axial_freqs(9, 16)
    qs = torch.randn(2, 4, 9, 16, 64, generator=g)
    rope_out["spatial_in"] = qs.numpy()
    rope_out["spatial_freqs_param"] = rot_s.freqs.detach().numpy()
    rope_out["spatial_axial_freqs"] = sfreqs.numpy()
    rope_out["spatial_out"] = apply_rotary_emb(sfreqs, qs).numpy()
    # VAE partial rope: head_dim 64, dim=16, max_freq=H*W on (6,8) grid
    rot_v = RotaryEmbedding(dim=16, freqs_for="pixel", max_freq=48)
    vfreqs = rot_v.get_axial_freqs(6, 8)
    qv = torch.randn(2, 4, 6, 8, 64, generator=g)
    rope_out["vae_in"] = qv.numpy()
    rope_out["vae_axial_freqs"] = vfreqs.numpy()
    rope_out["vae_out"] = apply_rotary_emb(vfreqs, qv).numpy()
    np.savez(os.path.join(OUT, "rope.npz"), **rope_out)

    # ---------------------------------------------------- small DiT parity
    dit = DiT(
        input_h=18, input_w=32, patch_size=2, in_channels=16, hidden_size=128,
        depth=2, num_heads=4, mlp_ratio=4.0, external_cond_dim=25, max_frames=5,
    ).eval()
    randomize_(dit, seed=11)
    save_model(dit, os.path.join(OUT, "dit_small.safetensors"))
    g = torch.Generator().manual_seed(13)
    x = torch.randn(2, 5, 16, 18, 32, generator=g)
    t = torch.randint(0, 1000, (2, 5), generator=g)
    actions = torch.randn(2, 5, 25, generator=g)
    with torch.no_grad():
        v_cond = dit(x, t, actions)
        v_uncond = dit(x, t, None)
        # growing-window case: T=3
        v_t3 = dit(x[:, :3], t[:, :3], actions[:, :3])
    np.savez(
        os.path.join(OUT, "dit_small.npz"),
        x=x.numpy(), t=t.numpy().astype(np.int32), actions=actions.numpy(),
        v_cond=v_cond.numpy(), v_uncond=v_uncond.numpy(), v_t3=v_t3.numpy(),
    )

    # timestep embedder closed form
    temb = dit.t_embedder.timestep_embedding(torch.tensor([0.0, 1.0, 15.0, 999.0]), 256)
    np.savez(
        os.path.join(OUT, "timestep_embedding.npz"),
        t=np.array([0.0, 1.0, 15.0, 999.0], np.float32), emb=temb.numpy(),
    )

    # ---------------------------------------------------- small VAE parity
    vae = AutoencoderKL(
        latent_dim=8, input_height=120, input_width=160, patch_size=20,
        enc_dim=128, enc_depth=2, enc_heads=4, dec_dim=128, dec_depth=3,
        dec_heads=4, mlp_ratio=4.0,
    ).eval()
    randomize_(vae, seed=17)
    save_model(vae, os.path.join(OUT, "vae_small.safetensors"))
    g = torch.Generator().manual_seed(19)
    img = torch.rand(2, 3, 120, 160, generator=g) * 2 - 1
    with torch.no_grad():
        post = vae.encode(img)
        mean, logvar = post.mean, post.logvar
        dec = vae.decode(mean)
    np.savez(
        os.path.join(OUT, "vae_small.npz"),
        img=img.numpy(), mean=mean.numpy(), logvar=logvar.numpy(), dec=dec.numpy(),
    )

    # ------------------------------------------- denoise_step / sampler math
    betas = ref_utils.sigmoid_beta_schedule(1000, clamp_min=1e-6).float()
    abar = torch.cumprod(1 - betas, 0).reshape(-1, 1, 1, 1)
    noise_range = torch.linspace(0, 999, 21).long()
    g = torch.Generator().manual_seed(23)
    x_noisy = torch.randn(2, 5, 16, 18, 32, generator=g)
    acts = torch.randn(2, 5, 25, generator=g)
    outs = {}
    with torch.no_grad():
        for noise_idx in (20, 10, 1, 0):
            x_pred, v_pred = train_dit.denoise_step(
                dit_model=dit, x_noisy=x_noisy.clone(), actions=acts,
                noise_idx=noise_idx, stabilization_level=15,
                noise_range=noise_range, alphas_cumprod=abar,
                start_frame=0, dtype=torch.float32,
            )
            outs[f"x_pred_{noise_idx}"] = x_pred.numpy()
            outs[f"v_pred_{noise_idx}"] = v_pred.numpy()
        # sliding-window crop case (start_frame=2 => window T=3)
        x_pred_sw, v_pred_sw = train_dit.denoise_step(
            dit_model=dit, x_noisy=x_noisy.clone(), actions=acts, noise_idx=10,
            stabilization_level=15, noise_range=noise_range, alphas_cumprod=abar,
            start_frame=2, dtype=torch.float32,
        )
        outs["x_pred_sw"] = x_pred_sw.numpy()
        outs["v_pred_sw"] = v_pred_sw.numpy()
    np.savez(
        os.path.join(OUT, "denoise_step.npz"),
        x_noisy=x_noisy.numpy(), actions=acts.numpy(),
        noise_range=noise_range.numpy().astype(np.int32), **outs,
    )

    # ------------------------------------------------- full-size manifests
    from model.dit import DiT_models
    from model.vae import VAE_models

    full_dit = DiT_models["DiT-S/2"]()
    full_vae = VAE_models["vit-l-20-shallow-encoder"]()
    manifest = {
        "dit": {k: list(v.shape) for k, v in full_dit.state_dict().items()},
        "vae": {k: list(v.shape) for k, v in full_vae.state_dict().items()},
        "dit_params": sum(p.numel() for p in full_dit.parameters()),
        "vae_params": sum(p.numel() for p in full_vae.parameters()),
    }
    with open(os.path.join(OUT, "state_dict_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)

    print("golden fixtures written to", OUT)
    print("full DiT params:", manifest["dit_params"])
    print("full VAE params:", manifest["vae_params"])


if __name__ == "__main__":
    main()
