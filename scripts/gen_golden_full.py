"""Generate FULL-SIZE parity fixtures from the torch reference.

Round-1 goldens were toy-scale (128-dim/2-block); this produces the flagship
geometry — DiT-S/2 (~0.67B params) and ViT-L/20 (~0.24B) — with seeded random
weights, records full-size torch forwards, and writes the checkpoints in the
exact shipped safetensors layout. Certifies at full scale what the small
goldens cannot: 16-deep scan stacking, 64-dim heads with full-width rope,
the 1024-dim VAE partial rotation, and the complete checkpoint key-set
(VERDICT r1, missing #1).

The checkpoints (~3.7 GB) land in tests/golden_full/ (gitignored); the .npz
forward records are small and committed.

Usage:  python scripts/gen_golden_full.py          (~10 min on 1 CPU core)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import torch

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "golden_full")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, SCRIPTS)
sys.path.insert(0, REPO)

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

from gen_golden import install_stubs, randomize_  # noqa: E402


def main():
    install_stubs()
    sys.path.insert(0, REFERENCE)
    torch.manual_seed(0)
    from safetensors.torch import save_model

    from model.dit import DiT_models  # noqa: E402
    from model.vae import VAE_models  # noqa: E402

    # ------------------------------------------------------------ full DiT
    t0 = time.time()
    dit = DiT_models["DiT-S/2"]().eval()
    randomize_(dit, seed=101, std=0.02)
    save_model(dit, os.path.join(OUT, "dit_full.safetensors"))
    print(f"DiT built+saved ({sum(p.numel() for p in dit.parameters()):,} "
          f"params) in {time.time()-t0:.0f}s", flush=True)

    g = torch.Generator().manual_seed(103)
    x = torch.randn(1, 5, 16, 18, 32, generator=g)
    t = torch.randint(0, 1000, (1, 5), generator=g)
    actions = torch.randn(1, 5, 25, generator=g)
    t0 = time.time()
    with torch.no_grad():
        v_cond = dit(x, t, actions)
        v_uncond = dit(x, t, None)
        v_t3 = dit(x[:, :3], t[:, :3], actions[:, :3])
    print(f"DiT forwards in {time.time()-t0:.0f}s", flush=True)
    np.savez(
        os.path.join(OUT, "dit_full.npz"),
        x=x.numpy(), t=t.numpy().astype(np.int32), actions=actions.numpy(),
        v_cond=v_cond.numpy(), v_uncond=v_uncond.numpy(), v_t3=v_t3.numpy(),
    )
    del dit

    # ------------------------------------------------------------ full VAE
    t0 = time.time()
    vae = VAE_models["vit-l-20-shallow-encoder"]().eval()
    randomize_(vae, seed=107, std=0.02)
    save_model(vae, os.path.join(OUT, "vae_full.safetensors"))
    print(f"VAE built+saved ({sum(p.numel() for p in vae.parameters()):,} "
          f"params) in {time.time()-t0:.0f}s", flush=True)

    g = torch.Generator().manual_seed(109)
    img = torch.rand(1, 3, 360, 640, generator=g) * 2 - 1
    t0 = time.time()
    with torch.no_grad():
        post = vae.encode(img)
        mean, logvar = post.mean, post.logvar
        dec = vae.decode(mean)
    print(f"VAE forwards in {time.time()-t0:.0f}s", flush=True)
    np.savez(
        os.path.join(OUT, "vae_full.npz"),
        img=img.numpy(), mean=mean.numpy(), logvar=logvar.numpy(),
        dec=dec.numpy(),
    )
    print("full-size fixtures written to", OUT)


if __name__ == "__main__":
    main()
