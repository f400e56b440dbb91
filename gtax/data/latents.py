"""Precomputed-latent training: encode each clip through the frozen VAE
ONCE, cache the latents, and feed them straight into the diffusion loss.

The reference re-encodes every batch through the frozen 0.24B VAE inside
every training step, forever (/root/reference/train_dit.py:570 — the VAE
never trains, so this is pure repeated work). Caching removes the encode
from the step's critical path entirely — the single biggest train-step
FLOP reduction available without touching the model — and shrinks the
compiled step program.

Latents are stored pre-scaled (encode_frames output: posterior mean *
LATENT_SCALE), so cached training is BIT-IDENTICAL to on-the-fly encoding
with the same VAE params and compute dtype (tested).

    ds = make_dataset("hfdataset", "train", True)
    lat = LatentCacheDataset.build(ds, vae_params, vae_cfg, "cache/train")
    # later runs: LatentCacheDataset("cache/train")

The cache is two npy files (memory-mapped on read):
    latents.npy  (N, T, C, h, w) float32 (or float16 via dtype=)
    actions.npy  (N, T, A) float32           [only when the clips carry them]
"""

from __future__ import annotations

import json
import os

import numpy as np


class LatentCacheDataset:
    """Map-style dataset over a latent cache directory."""

    def __init__(self, cache_dir: str):
        meta_path = os.path.join(cache_dir, "meta.json")
        with open(meta_path) as f:
            self.meta = json.load(f)
        self.latents = np.load(
            os.path.join(cache_dir, "latents.npy"), mmap_mode="r")
        # trust the meta, not file presence — a rebuild without actions
        # must not serve a previous build's stale actions.npy
        self.actions = (
            np.load(os.path.join(cache_dir, "actions.npy"), mmap_mode="r")
            if self.meta.get("has_actions") else None)
        self.cache_dir = cache_dir

    def __len__(self):
        # meta n, not the file's leading dim: a stream that ended early
        # leaves the preallocated memmap larger than the sample count
        return self.meta["n"]

    def __getitem__(self, i):
        item = {"latents": np.asarray(self.latents[i], np.float32)}
        if self.actions is not None:
            item["actions"] = np.asarray(self.actions[i], np.float32)
        return item

    @classmethod
    def build(cls, dataset, vae_params, vae_cfg, cache_dir: str,
              encode_batch: int = 32, compute_dtype=None,
              dtype=np.float32, progress_every: int = 50,
              max_samples: int | None = None):
        """Encode a clip dataset into a latent cache.

        Samples must be {"video": (T, 3, H, W) float32 [0,1],
        "actions": (T, A)?}. Map-style datasets (hfdataset/dummy) are read
        by index; iterable streams (the tar streamer) are consumed in
        stream order for up to min(len(dataset), max_samples) clips — make
        the stream non-resampled or pass max_samples, or the build runs to
        the registry split size. Uses the SAME encode_frames path as the
        trainer, so cached and on-the-fly training produce identical losses
        for identical (vae_params, compute_dtype)."""
        import itertools

        import jax
        import jax.numpy as jnp

        from gtax.train.trainer import encode_frames

        if compute_dtype is None:
            compute_dtype = jnp.float32
        os.makedirs(cache_dir, exist_ok=True)
        n = len(dataset)
        if max_samples is not None:
            n = min(n, max_samples)
        assert n > 0, "dataset reports zero length; pass max_samples"
        if hasattr(dataset, "__getitem__"):
            sample_iter = (dataset[i] for i in range(n))
        else:
            sample_iter = itertools.islice(iter(dataset), n)
        # params must be an ARGUMENT, not a closure capture: closed-over
        # arrays embed as constants in the compiled program (~1 GB of VAE
        # weights in the HLO — rejected outright by remote-compile setups)
        encode = jax.jit(
            lambda p, v: encode_frames(p, vae_cfg, v, compute_dtype))

        lat_path = os.path.join(cache_dir, "latents.npy")
        act_path = os.path.join(cache_dir, "actions.npy")
        for stale in (lat_path, act_path,
                      os.path.join(cache_dir, "meta.json")):
            if os.path.exists(stale):  # rebuilds must not mix with old files
                os.remove(stale)
        lat_out = act_out = None
        done = 0
        while done < n:
            samples = list(itertools.islice(sample_iter, encode_batch))
            if not samples:  # stream ended early (non-resampled short split)
                break
            hi = done + len(samples)
            if "video_u8" in samples[0]:
                # pixel_u8 fast-path samples (webtar default): uint8
                # channel-last; encode_frames converts on device
                video = np.stack([np.asarray(s["video_u8"])
                                  for s in samples])
            else:
                video = np.stack(
                    [np.asarray(s["video"], np.float32) for s in samples])
            lat = np.asarray(encode(vae_params, jnp.asarray(video)), dtype)
            if lat_out is None:
                lat_out = np.lib.format.open_memmap(
                    lat_path, mode="w+", dtype=dtype,
                    shape=(n,) + lat.shape[1:])
                if "actions" in samples[0]:
                    a0 = np.asarray(samples[0]["actions"], np.float32)
                    act_out = np.lib.format.open_memmap(
                        act_path, mode="w+", dtype=np.float32,
                        shape=(n,) + a0.shape)
            lat_out[done:hi] = lat
            if act_out is not None:
                act_out[done:hi] = np.stack(
                    [np.asarray(s["actions"], np.float32) for s in samples])
            done = hi
            if progress_every and (done // encode_batch) % progress_every == 0:
                print(f"[gtax.data] latent cache: {done}/{n}")
        assert lat_out is not None, "dataset yielded no samples"
        lat_out.flush()
        if act_out is not None:
            act_out.flush()
        with open(os.path.join(cache_dir, "meta.json"), "w") as f:
            json.dump({
                "n": done, "latent_shape": list(lat_out.shape[1:]),
                "dtype": np.dtype(dtype).name,
                "latent_dim": vae_cfg.latent_dim,
                "has_actions": act_out is not None,
            }, f)
        return cls(cache_dir)
