"""VAE encode/decode throughput (BASELINE.md: "VAE enc/dec imgs/sec").

Measures the frozen ViT-L/20 autoencoder (reference model/vae.py:363-380)
on the current default device: images/sec for encode (360x640x3 -> 576x16
latent posterior mean) and decode (the generate.py:238-242 batch-decode
path), at a sweep of batch sizes.

Usage: python scripts/vae_bench.py [--batches 1,8,32] [--dtype bfloat16]
Writes one JSON line; machine-readable copy appended to docs/vae_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # an explicit JAX_PLATFORMS=cpu must win over axon

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fused", action="store_true",
                   help="fused per-block Pallas kernels "
                        "(gtax/kernels/vae_block.py)")
    p.add_argument("--no_save", action="store_true",
                   help="don't overwrite docs/vae_bench.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gtax.models.vae import VAE_MODELS, vae_decode, vae_encode, vae_init
    from gtax.core.constants import LATENT_SCALE

    cfg = VAE_MODELS["vit-l-20-shallow-encoder"]()
    dtype = jnp.dtype(args.dtype)
    params = jax.jit(lambda k: vae_init(k, cfg))(jax.random.PRNGKey(0))

    results = {}
    for B in [int(x) for x in args.batches.split(",")]:
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (B, 3, cfg.input_height, cfg.input_width)
        )

        @jax.jit
        def enc(p, x):
            # caller contract: pixels scaled to [-1, 1], posterior mean,
            # latent scale 4/51 (reference generate.py:50-66)
            mean, _ = vae_encode(p, cfg, x * 2.0 - 1.0, dtype,
                                 fused=args.fused)
            return mean * LATENT_SCALE

        lat = enc(params, x)

        @jax.jit
        def dec(p, z):
            return vae_decode(p, cfg, z / LATENT_SCALE, dtype,
                              fused=args.fused)

        out = dec(params, lat)
        jnp.sum(out).block_until_ready()

        def timed(fn, *a):
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                # fetch a reduction: through the device tunnel
                # block_until_ready can return early (scripts/fwd_bench.py)
                float(jnp.sum(fn(*a)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        te = timed(enc, params, x)
        td = timed(dec, params, lat)
        results[str(B)] = {
            "encode_imgs_per_s": round(B / te, 2),
            "decode_imgs_per_s": round(B / td, 2),
            "encode_ms": round(te * 1e3, 2),
            "decode_ms": round(td * 1e3, 2),
        }
        print(f"B={B}: {json.dumps(results[str(B)])}", flush=True)

    line = {
        "device": jax.devices()[0].device_kind,
        "dtype": dtype.name,
        "fused": args.fused,
        "results": results,
    }
    print(json.dumps(line))
    if not args.no_save:
        with open(os.path.join(REPO, "docs", "vae_bench.json"), "w") as f:
            json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
