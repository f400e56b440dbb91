"""High-level serving API: load checkpoints once, generate videos in one
call, with every serving feature (fused kernels, int8 W8A8, conditioning
cache, incremental decoding, batched / multi-chip serving) behind a single
config object.

This is the library equivalent of `gtax.cli.generate` (which wraps it); the
reference has no library surface at all — `generate.py` is script-only.

    from gtax.serving import ServingConfig, VideoGenerator

    gen = VideoGenerator.load("dit.safetensors", "vit-l-20.safetensors",
                              ServingConfig(quantize="int8"))
    frames = gen.generate(prompt_frames, actions, num_frames=32, seed=0)
    # frames: (B, num_frames, H, W, 3) uint8 — ready for mp4 muxing

Defaults reproduce the reference sampling scheme exactly (stabilization 15,
window 5, DDIM over noise_steps+1 — /root/reference/generate.py:138-235);
speed features that change semantics (pipeline_depth, attn_broadcast,
quantize) are opt-in.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gtax.io import safetensors_port as port
from gtax.models.dit import DiT_MODELS, dit_apply
from gtax.models.vae import VAE_MODELS
from gtax.nn import attention as attention_mod
from gtax.sampling.diffusion import SamplerConfig, make_rollout
from gtax.train.trainer import decode_frames, encode_frames


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Serving knobs; docs/SERVING.md explains each trade-off."""
    dtype: str = "bfloat16"
    attention_backend: str = "fused"   # xla | pallas | fused | fused_all
    quantize: str = "none"             # none | int8 (W8A8 block GEMMs)
    unstack: bool = True               # per-block serving weight layout
    cond_cache: bool = True            # bit-exact adaLN trajectory precompute
    incremental: bool = True           # context K/V prefill + last-frame steps
    pipeline_depth: int = 1            # >1: pyramid-pipelined (approximate)
    attn_broadcast: int = 1            # >1: attention broadcast (approximate)
    noise_steps: int = 100
    mesh_data: int = 1                 # >1: shard_map batched serving
    mesh_model: int = 1                # >1: GSPMD tensor-parallel serving
    # decode at most this many frames per VAE call (bounds decoder activation
    # memory for long rollouts; None = one batched decode like the reference,
    # generate.py:238-242). Bit-identical output either way (per-frame model).
    decode_chunk: int | None = None
    # directory of AOT-serialized executables (gtax.aot): first run compiles
    # and saves, later processes load the compiled executable and skip the
    # ~4-minute unstacked-layout compile entirely. Covers the single-mesh
    # paths and shard_map-DP batched serving (mesh_data > 1); GSPMD
    # mesh_model serving keeps the jit path (xla backend, fast compile).
    aot_dir: str | None = None
    dit_model: str = "DiT-S/2"
    vae_model: str = "vit-l-20-shallow-encoder"


class VideoGenerator:
    """Holds prepared params + a compiled-on-first-use rollout."""

    def __init__(self, dit_params, vae_params, cfg: ServingConfig):
        assert not (cfg.mesh_model > 1 and cfg.mesh_data > 1), (
            "mesh_model and mesh_data are mutually exclusive serving modes")
        self.cfg = cfg
        self.dit_cfg = DiT_MODELS[cfg.dit_model]()
        self.vae_cfg = VAE_MODELS[cfg.vae_model]()
        dtype = jnp.dtype(cfg.dtype)
        self._dtype = dtype
        # the attention backend is consulted at trace time; it is applied as
        # a scope around this instance's compute calls (generate) so two
        # generators with different backends don't corrupt each other
        self._backend = cfg.attention_backend

        if dtype != jnp.float32:
            from gtax.models.dit import cast_params_for_inference

            dit_params = jax.jit(
                lambda p: cast_params_for_inference(p, dtype))(dit_params)
        if cfg.unstack:
            from gtax.models.dit import unstack_for_inference

            dit_params = unstack_for_inference(dit_params, self.dit_cfg)
        if cfg.quantize == "int8":
            from gtax.models.dit import quantize_for_inference

            dit_params = quantize_for_inference(dit_params, self.dit_cfg)

        self._mesh = None
        if cfg.mesh_model > 1:
            assert cfg.quantize != "int8", (
                "mesh_model: the int8 Pallas kernels are single-chip; "
                "use the bf16 xla path for TP serving")
            self._backend = "xla"  # a Pallas custom call can't be GSPMD-split
            from gtax.parallel import mesh as meshlib

            self._mesh = meshlib.make_mesh(
                meshlib.MeshConfig(data=1, model=cfg.mesh_model),
                devices=jax.devices()[: cfg.mesh_model])
            dit_params = jax.device_put(
                dit_params, meshlib.param_sharding(self._mesh, dit_params))
        self.dit_params = dit_params
        self.vae_params = vae_params

        sampler = SamplerConfig(
            ddim_noise_steps=cfg.noise_steps,
            stabilization_level=15,      # reference generate.py:138
            schedule_clamp_min=1e-4,
            attn_broadcast=cfg.attn_broadcast,
        )

        def dit_fn(params, x, t, a, valid):
            return dit_apply(params, self.dit_cfg, x, t, a, valid,
                             compute_dtype=dtype)

        pab = None
        if cfg.attn_broadcast > 1:
            from gtax.models.dit import make_pab_fns

            pab = make_pab_fns(self.dit_cfg, dtype)
        if cfg.pipeline_depth > 1:
            from gtax.sampling.diffusion import make_pipelined_rollout

            cond = incremental = None
            if (cfg.attn_broadcast == 1 and cfg.unstack and cfg.cond_cache
                    and cfg.incremental and self._mesh is None
                    and self._backend in ("fused", "fused_all")):
                from gtax.models.dit import (make_cond_fns,
                                             make_incremental_fns)

                # per-cycle context prefill + P-live-frame steps: the two
                # biggest serving levers composed (docs/PERF.md round 3)
                cond = make_cond_fns(self.dit_cfg, dtype)
                incremental = make_incremental_fns(self.dit_cfg, dtype)
            self._rollout = make_pipelined_rollout(
                dit_fn, self.dit_cfg.max_frames, sampler,
                pipeline_depth=cfg.pipeline_depth, pab=pab, cond=cond,
                incremental=incremental)
        else:
            cond = incremental = None
            if (cfg.attn_broadcast == 1 and cfg.unstack and cfg.cond_cache
                    and self._mesh is None):
                from gtax.models.dit import make_cond_fns

                cond = make_cond_fns(self.dit_cfg, dtype)
                if cfg.incremental and self._backend in (
                        "fused", "fused_all"):
                    from gtax.models.dit import make_incremental_fns

                    incremental = make_incremental_fns(self.dit_cfg, dtype)
            self._rollout = make_rollout(
                dit_fn, self.dit_cfg.max_frames, sampler, pab=pab,
                cond=cond, incremental=incremental)

        # fused VAE block kernels ride the same backend switch as the
        # DiT kernels (gtax/kernels/vae_block.py; ~2x decode throughput)
        vae_fused = cfg.attention_backend in ("fused", "fused_all")
        self._encode = jax.jit(
            lambda vp, v: encode_frames(vp, self.vae_cfg, v, dtype,
                                        fused=vae_fused))
        self._decode = jax.jit(
            lambda vp, lat: decode_frames(vp, self.vae_cfg, lat, dtype,
                                          fused=vae_fused))
        self._dp_runners = {}
        self._aot = None
        self._aot_runners = {}
        import threading

        # prewarm() builds runners from a background thread; serialize
        # runner creation so a concurrent generate() can't compile twice
        self._aot_lock = threading.Lock()
        # AOT covers the single-mesh paths AND shard_map-DP batched serving
        # (a shard_map executable serializes/loads like any other, with its
        # device count recorded — gtax.aot). GSPMD mesh_model serving stays
        # on jit: it runs the xla backend whose compile is seconds, so an
        # artifact buys nothing.
        if cfg.aot_dir and cfg.mesh_model <= 1:
            from gtax.aot import AotCache

            self._aot = AotCache(cfg.aot_dir)
            # the abstract call signature alone does NOT identify a compiled
            # rollout: noise_steps, backend, pipeline/broadcast/cache modes,
            # quantize and dtype are closure-captured in the jitted fn and
            # change the program without changing any arg shape. Bake every
            # semantics-affecting config field into the artifact tag so two
            # configs can never collide on one executable.
            import hashlib as _hashlib

            sem = {f.name: getattr(cfg, f.name)
                   for f in dataclasses.fields(cfg)
                   if f.name not in ("aot_dir",)}
            self._aot_tag = "@" + _hashlib.sha256(
                repr(sorted(sem.items())).encode()).hexdigest()[:12]
        else:
            self._aot_tag = ""
        # stage timings of the most recent generate() call (seconds):
        # {"encode_s", "rollout_s", "decode_s"} — rollout_s is the number to
        # compare against bench.py / docs/PERF.md (those time the rollout)
        self.last_timings = {}

    @classmethod
    def load(cls, dit_path: str, vae_path: str,
             cfg: ServingConfig = ServingConfig()):
        """Load reference-format safetensors checkpoints (or pass empty
        paths for random weights — debug presets drive a checkpoint-free
        smoke path on any hardware)."""
        dit_cfg = DiT_MODELS[cfg.dit_model]()
        vae_cfg = VAE_MODELS[cfg.vae_model]()
        if dit_path:
            dit_params = port.load_dit(dit_path, dit_cfg)
        else:
            from gtax.models.dit import dit_init

            dit_params = jax.jit(
                lambda k: dit_init(k, dit_cfg))(jax.random.PRNGKey(0))
        if vae_path:
            vae_params = port.load_vae(vae_path, vae_cfg)
        else:
            from gtax.models.vae import vae_init

            vae_params = jax.jit(
                lambda k: vae_init(k, vae_cfg))(jax.random.PRNGKey(1))
        return cls(dit_params, vae_params, cfg)

    def prewarm(self, num_frames: int = 32, batch_size: int = 1,
                n_prompt: int = 4, use_actions: bool = False,
                wait: bool = False):
        """Build AND EXECUTE the encode/rollout/decode AOT runners for one
        generate() shape on dummy zeros, in a background thread.

        Why: on directly-attached hosts a loaded executable starts in ~4 s,
        but on tunnelled chips the FIRST execution pays a one-time
        executable upload/link (~minutes, docs/SERVING.md) — without
        prewarm that cost lands on the user's first real generate() call.
        Dispatching a dummy execution at load time overlaps it with prompt
        preparation/IO. The dummy call reuses _aot_call, so the round-4
        call-time validation + fallback-to-fresh-compile logic applies.
        wait=True blocks until warm (tests; measuring cold-start).
        Returns the thread (already finished when wait=True)."""
        import threading

        cfg, dit_cfg, vae_cfg = self.cfg, self.dit_cfg, self.vae_cfg
        B, T0 = batch_size, n_prompt

        def work():
            try:
                with attention_mod.backend_scope(self._backend):
                    video = jnp.zeros(
                        (B, T0, 3, vae_cfg.input_height,
                         vae_cfg.input_width), jnp.float32)
                    lat0 = self._aot_call("encode", self._encode,
                                          (self.vae_params, video))
                    actions = (jnp.zeros((B, num_frames,
                                          dit_cfg.external_cond_dim),
                                         jnp.float32)
                               if use_actions else None)
                    lat = self._aot_call(
                        "rollout", self._rollout,
                        (self.dit_params, lat0, actions,
                         jax.random.PRNGKey(0)),
                        static={"num_gen_frames": num_frames - T0})
                    pix = self._decode_frames(lat)
                    jax.block_until_ready(pix)
                self._aot.events.append(("prewarm_done", f"B{B}x{num_frames}"))
            except Exception as e:  # never kill the caller from the thread
                self._aot.events.append(("prewarm_failed", repr(e)))

        if self._aot is None:
            return None
        self._aot.events.append(("prewarm_start", f"B{B}x{num_frames}"))
        t = threading.Thread(target=work, daemon=True,
                             name="gtax-aot-prewarm")
        t.start()
        if wait:
            t.join()
        return t

    def _aot_call(self, tag, fn, args, static=None):
        """Run the jitted fn through the AOT executable cache when enabled
        (gtax.aot): first process pays the compile and saves the serialized
        executable; later processes load it and skip XLA entirely."""
        static = static or {}
        if self._aot is None:
            return fn(*args, **static)
        from gtax.aot import signature_key

        tag = tag + self._aot_tag
        key = signature_key(tag, args, {}, static)
        with self._aot_lock:
            runner = self._aot_runners.get(key)
            if runner is None:
                runner = self._aot.load_or_compile(fn, tag, args,
                                                   static=static)
                self._aot_runners[key] = runner
        try:
            out = runner(*args)
            if (getattr(runner, "from_cache", False)
                    and not getattr(runner, "validated", False)):
                # XLA AOT-loader runtime faults surface ASYNCHRONOUSLY
                # (on a later buffer sync, not the dispatch) — block on a
                # loaded runner's first result so a fault lands in this
                # try block instead of the caller's block_until_ready
                jax.block_until_ready(out)
                runner.validated = True
            return out
        except Exception as e:
            # a DESERIALIZED executable can fail at call time — fall back
            # to a fresh compile once; genuine compute errors from a
            # freshly-compiled executable propagate
            if not getattr(runner, "from_cache", False):
                raise
            self._aot.events.append(("call_failed", f"{tag}: {e!r}"))
            runner = self._aot.load_or_compile(fn, tag, args, static=static,
                                               force_compile=True)
            self._aot_runners[key] = runner
            return runner(*args)

    def _decode_frames(self, lat):
        """VAE-decode latents to uint8 pixels, optionally in frame chunks.

        The VAE is per-frame, so chunking is bit-identical; it bounds the
        decoder's activation footprint (~chunk x 576 x 1024 rows) for
        multi-hundred-frame rollouts. The unchunked path returns the DEVICE
        array so generate() can time device decode and host fetch separately;
        the chunked path fetches each part eagerly (that is its memory bound)
        and returns host pixels."""
        chunk = self.cfg.decode_chunk
        T = lat.shape[1]
        if chunk is None or chunk >= T:
            return self._aot_call("decode", self._decode,
                                  (self.vae_params, lat))
        # equal-size chunks reuse ONE compiled decode; the ragged tail (if
        # any) compiles once more
        parts = [
            np.asarray(self._decode(self.vae_params, lat[:, i:i + chunk]))
            for i in range(0, T - T % chunk, chunk)
        ]
        if T % chunk:
            parts.append(
                np.asarray(self._decode(self.vae_params,
                                        lat[:, T - T % chunk:])))
        return np.concatenate(parts, axis=1)

    def _dp_runner(self, num_gen_frames: int):
        if num_gen_frames not in self._dp_runners:
            from gtax.parallel import mesh as meshlib

            dp_mesh = meshlib.make_mesh(
                meshlib.MeshConfig(data=self.cfg.mesh_data, model=1),
                devices=jax.devices()[: self.cfg.mesh_data])
            self._dp_runners[num_gen_frames] = meshlib.data_parallel_rollout(
                self._rollout, dp_mesh, num_gen_frames=num_gen_frames)
        return self._dp_runners[num_gen_frames]

    def generate(self, prompt_frames, actions=None, num_frames: int = 32,
                 seed: int = 0, noise=None):
        """prompt_frames: (B, T0, 3, H, W) float in [0, 1] (or (T0, 3, H, W)
        for B=1); actions: (B, num_frames, 25) or None; returns
        (B, num_frames, H, W, 3) uint8 pixels. num_frames counts prompt +
        generated (reference --total-frames semantics).

        Multi-host + mesh_data: every process passes the identical global
        batch, contributes only its local rows to the device mesh, and gets
        back its OWN (B/process_count) rows — each host writes its own
        videos (DDP-style serving; gathering pixels cross-host would move
        orders of magnitude more bytes than the latents are worth)."""
        video = jnp.asarray(prompt_frames)
        if video.ndim == 4:
            video = video[None]
        B, n_prompt = video.shape[:2]
        assert num_frames > n_prompt, (
            f"num_frames={num_frames} must exceed the {n_prompt} prompt "
            f"frames (it counts prompt + generated)")
        if self.cfg.mesh_data > 1:
            assert B % self.cfg.mesh_data == 0, (
                f"batch {B} must divide over mesh_data={self.cfg.mesh_data}")
        if actions is not None:
            actions = jnp.asarray(actions)
            if actions.ndim == 2:
                actions = actions[None]
            assert actions.shape[1] >= num_frames, (
                f"need actions for all {num_frames} frames")
        if noise is not None:
            assert self.cfg.mesh_data <= 1 and self.cfg.pipeline_depth <= 1, (
                "pre-drawn noise is a single-mesh, non-pipelined hook")
        rng = jax.random.PRNGKey(seed)
        n_gen = num_frames - n_prompt
        with attention_mod.backend_scope(self._backend):
            t0 = time.perf_counter()
            latents = self._aot_call("encode", self._encode,
                                     (self.vae_params, video))
            latents.block_until_ready()
            t1 = time.perf_counter()
            if self._mesh is not None:
                from gtax.parallel.mesh import replicated

                latents = jax.device_put(latents, replicated(self._mesh))
                if actions is not None:
                    actions = jax.device_put(actions, replicated(self._mesh))
            if self.cfg.mesh_data > 1:
                runner = self._dp_runner(n_gen)
                if self._aot is None:
                    lat = runner(self.dit_params, latents, actions, rng)
                else:
                    # AOT the inner shard_map jit against device-put args
                    lat = self._aot_call(
                        f"rollout_dp{self.cfg.mesh_data}", runner.sharded,
                        runner.prepare(self.dit_params, latents, actions,
                                       rng))
            elif noise is None:
                lat = self._aot_call(
                    "rollout", self._rollout,
                    (self.dit_params, latents, actions, rng),
                    static={"num_gen_frames": n_gen})
            else:
                lat = self._rollout(self.dit_params, latents, actions, rng,
                                    num_gen_frames=n_gen, noise=noise)
            lat.block_until_ready()
            t2 = time.perf_counter()
            if jax.process_count() > 1 and self.cfg.mesh_data > 1:
                # keep decode local: reassemble this host's latent rows on
                # host (the shards live on different local devices; latents
                # are ~1000x smaller than the pixels they decode to)
                shards = sorted(lat.addressable_shards,
                                key=lambda s: s.index[0].start or 0)
                lat = np.concatenate(
                    [np.asarray(s.data) for s in shards], axis=0)
            pix = self._decode_frames(lat)
            if not isinstance(pix, np.ndarray):
                # sync on a 1-element fetch, not block_until_ready: the
                # tunnelled runtime's block_until_ready can return before the
                # work drains (scripts/fwd_bench.py), and the full-pixel
                # fetch is pure host IO that must not be billed to decode
                jax.device_get(pix[(0,) * pix.ndim])
            t3 = time.perf_counter()
            pixels = np.asarray(pix)
            t4 = time.perf_counter()
        self.last_timings = {"encode_s": t1 - t0, "rollout_s": t2 - t1,
                             "decode_s": t3 - t2, "fetch_s": t4 - t3}
        return pixels
