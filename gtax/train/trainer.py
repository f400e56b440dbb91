"""The training orchestrator.

Parity target: DiffusionTrainer (/root/reference/train_dit.py:173-1035) —
frozen-VAE latent encoding, diffusion-forcing loss, AdamW + warmup-cosine-
to-min-lr, grad accumulation, periodic validation / rollout / renoise evals,
two-tier checkpointing (weight-only safetensors exports + full train state),
resume with step/epoch/RNG restoration, metric logging.

TPU-native shape:
  - ONE jitted train step: VAE encode (frozen, under stop_gradient), loss over
    all generated frames, grad, clip, optimizer update — no Python inside.
  - Gradient accumulation is a lax.scan over micro-batches inside the step
    (the loader delivers batch_size * accum samples), reproducing the
    reference's grad semantics (sum of per-micro grads / accum).
  - Data parallelism via NamedSharding on the batch; XLA inserts the grad
    psum over the mesh's 'data' axis. Tensor parallelism optional via the
    'model' axis (gtax.parallel.mesh.param_sharding).
  - Full-state checkpoints via orbax; weight exports via the safetensors port
    so checkpoints round-trip with the reference ecosystem.
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gtax.core.constants import LATENT_SCALE
from gtax.core import schedules
from gtax.data.loader import Batch, DataLoader, device_prefetch, make_dataset
from gtax.io import safetensors_port as port
from gtax.models.dit import DiT_MODELS, dit_apply
from gtax.models.vae import VAE_MODELS, vae_decode, vae_encode
from gtax.nn import attention as attention_mod
from gtax.parallel import mesh as meshlib
from gtax.sampling.diffusion import (
    LossConfig,
    SamplerConfig,
    diffusion_forcing_loss,
    make_rollout,
    renoise_last_frame,
)
from gtax.train.config import TrainingConfig
from gtax.train.optim import make_optimizer
from gtax.utils.profiling import MFUCounter, StepTimer, dit_forward_flops

logger = logging.getLogger("gtax.train")


def as_float_video(video):
    """Accept uint8 channel-last (..., H, W, 3) host-layout pixels and
    convert ON DEVICE to the model's float (..., 3, H, W) in [0, 1]; float
    inputs pass through unchanged. The uint8 path is the fast data pipeline
    (gtax.data.webtar pixel_u8): the host skips the float cast + transpose
    and ships 4x fewer bytes; this cast fuses into the VAE's first op under
    jit."""
    v = jnp.asarray(video)
    if v.dtype != jnp.uint8:
        return v
    n = v.ndim
    v = v.transpose(*range(n - 3), n - 1, n - 3, n - 2)
    return v.astype(jnp.float32) / 255.0


def encode_frames(vae_params, vae_cfg, frames, compute_dtype,
                  fused=False):
    """frames (B,T,3,H,W) in [0,1] — or uint8 (B,T,H,W,3), converted on
    device by as_float_video — -> latents (B,T,C,h,w) float32
    (reference encode_frames, train_dit.py:329-351). fused=True takes the
    fused VAE block kernels (inference/serving only)."""
    frames = as_float_video(frames)
    B, T = frames.shape[:2]
    flat = frames.reshape(B * T, *frames.shape[2:])
    mean, _ = vae_encode(vae_params, vae_cfg, flat * 2.0 - 1.0, compute_dtype,
                         fused=fused)
    lat = mean * LATENT_SCALE
    lat = lat.reshape(B, T, vae_cfg.seq_h, vae_cfg.seq_w, vae_cfg.latent_dim)
    return lat.transpose(0, 1, 4, 2, 3).astype(jnp.float32)


def decode_frames(vae_params, vae_cfg, latents, compute_dtype,
                  fused=False):
    """latents (B,T,C,h,w) -> uint8 video (B,T,H,W,3)
    (reference decode_frames, train_dit.py:353-369). fused=True takes the
    fused VAE block kernels (inference/serving only)."""
    B, T, C, h, w = latents.shape
    flat = latents.transpose(0, 1, 3, 4, 2).reshape(B * T, h * w, C)
    pix = vae_decode(vae_params, vae_cfg, flat / LATENT_SCALE, compute_dtype,
                     fused=fused)
    pix = (pix + 1.0) / 2.0
    pix = pix.reshape(B, T, 3, vae_cfg.input_height, vae_cfg.input_width)
    pix = jnp.clip(pix * 255.0, 0, 255).astype(jnp.uint8)
    return pix.transpose(0, 1, 3, 4, 2)


class Trainer:
    def __init__(
        self,
        config: TrainingConfig,
        total_dataset_size: int,
        dit_cfg=None,
        vae_cfg=None,
        dit_params=None,
        vae_params=None,
        mesh=None,
    ):
        """dit_cfg/vae_cfg/params/mesh are injectable for tests and custom
        model variants; defaults are the flagship DiT-S/2 + ViT-L/20 loaded
        per config (reference train_dit.py:204-229)."""
        self.config = config
        self.compute_dtype = jnp.dtype(config.compute_dtype)
        attention_mod.set_backend(config.attention_backend)
        if config.int8_forward:
            from gtax.nn import branches

            assert config.attention_backend in ("fused", "fused_all"), (
                "int8_forward runs through the fused trainable kernels")
            branches.set_int8_fwd(True)

        self.mesh = mesh or meshlib.make_mesh(
            meshlib.MeshConfig(data=config.mesh_data, model=config.mesh_model)
        )
        self.n_devices = self.mesh.devices.size
        self.batch_sharding = meshlib.batch_sharding(self.mesh)
        self.replicated = meshlib.replicated(self.mesh)

        self.rng = jax.random.PRNGKey(config.seed)

        # models (registry lookup via config; reference hard-codes factories,
        # model/dit.py:379-389 — gtax keeps the same flagship defaults)
        self.dit_cfg = dit_cfg or DiT_MODELS[config.dit_model]()
        import dataclasses as _dc

        if config.remat and not self.dit_cfg.block_remat:
            self.dit_cfg = _dc.replace(self.dit_cfg, block_remat=True)
        if dit_params is not None:
            self.dit_params = dit_params
        elif config.pretrained_model:
            logger.info("Loading pretrained DiT from %s", config.pretrained_model)
            self.dit_params = port.load_dit(config.pretrained_model, self.dit_cfg)
        else:
            logger.info("Initializing new DiT model from scratch")
            self.rng, init_key = jax.random.split(self.rng)
            from gtax.models.dit import dit_init

            self.dit_params = dit_init(init_key, self.dit_cfg)
        if config.unstack_train and not isinstance(
                self.dit_params.get("blocks"), (tuple, list)):
            # per-block weight layout: the step HLO then contains no weight
            # slicing or stacked-grad accumulation (docs/PERF.md round 3);
            # save_model restacks for the safetensors export
            from gtax.models.dit import unstack_for_inference

            self.dit_params = unstack_for_inference(self.dit_params,
                                                    self.dit_cfg)
        self.vae_cfg = vae_cfg or VAE_MODELS[config.vae_model]()
        if vae_params is not None:
            self.vae_params = vae_params
        elif config.vae_checkpoint:
            self.vae_params = port.load_vae(config.vae_checkpoint, self.vae_cfg)
        else:
            # checkpoint-free smoke path (debug presets): random frozen VAE
            logger.warning("vae_checkpoint empty: initializing a RANDOM VAE "
                           "(smoke-test path; latents are meaningless)")
            from gtax.models.vae import vae_init

            self.rng, vae_key = jax.random.split(self.rng)
            self.vae_params = vae_init(vae_key, self.vae_cfg)

        assert (
            self.dit_cfg.in_channels == self.vae_cfg.latent_dim
            and self.dit_cfg.input_h == self.vae_cfg.seq_h
            and self.dit_cfg.input_w == self.vae_cfg.seq_w
        ), (
            f"DiT latent geometry ({self.dit_cfg.in_channels}ch "
            f"{self.dit_cfg.input_h}x{self.dit_cfg.input_w}) must match the "
            f"VAE ({self.vae_cfg.latent_dim}ch {self.vae_cfg.seq_h}x"
            f"{self.vae_cfg.seq_w}); check dit_model/vae_model pairing"
        )
        self.max_frames = self.dit_cfg.max_frames

        # steps math (reference train_dit.py:241-248)
        self.steps_per_epoch = total_dataset_size // (
            config.batch_size * self.n_devices * config.gradient_accumulation_steps
        )
        self.total_training_steps = self.steps_per_epoch * config.num_epochs
        if config.max_steps > 0:
            self.total_training_steps = min(self.total_training_steps,
                                            config.max_steps)
        warmup = int(config.warmup_ratio * self.total_training_steps)
        self.tx, self.lr_schedule = make_optimizer(
            config.learning_rate, config.min_learning_rate, warmup,
            self.total_training_steps, weight_decay=config.weight_decay,
            max_grad_norm=config.max_grad_norm,
            mu_dtype=jnp.bfloat16 if config.mu_bf16 else None,
        )
        self.opt_state = self.tx.init(self.dit_params)

        # diffusion constants (reference register_buffers, train_dit.py:286-327)
        betas = schedules.sigmoid_beta_schedule(1000, clamp_min=1e-6)
        self.alphas_cumprod = schedules.alphas_cumprod_from_betas(betas)
        self.noise_range = schedules.ddim_noise_range(config.ddim_noise_steps)
        self.noise_range_inference = schedules.ddim_noise_range(
            config.ddim_noise_steps_inference
        )
        self.stabilization_level = int(np.asarray(self.noise_range)[1])

        self.loss_cfg = LossConfig(
            ddim_noise_steps=config.ddim_noise_steps,
            ctx_max_noise_idx=config.ctx_max_noise_idx,
            noise_abs_max=config.noise_abs_max,
            n_prompt_frames=config.n_prompt_frames,
            max_frames=self.max_frames,
        )
        self.sampler_cfg = SamplerConfig(
            ddim_noise_steps=config.ddim_noise_steps_inference,
            stabilization_level=self.stabilization_level,
            noise_abs_max=config.noise_abs_max,
            schedule_clamp_min=1e-6,
        )

        self.global_step = 0
        self.start_epoch = 0
        self.wandb_run_id = None  # persisted in step.json so the run resumes
        self._place_state()
        self._build_steps()

        flops = 3.0 * dit_forward_flops(  # fwd + bwd ~ 3x fwd
            self.dit_cfg,
            config.batch_size * self.n_devices *
            config.gradient_accumulation_steps,
            self.max_frames,
        ) * max(1, 5 - config.n_prompt_frames)
        self.mfu = MFUCounter(flops, self.n_devices)
        self.timer = StepTimer()
        self._inflight = None  # (device metrics, entry time, lr) of the
        #                        last dispatched step (deferred fetch)

    # ------------------------------------------------------------ setup

    def _place_state(self):
        self.param_sharding = meshlib.param_sharding(self.mesh, self.dit_params)
        self.dit_params = jax.device_put(self.dit_params, self.param_sharding)
        self.vae_params = jax.device_put(self.vae_params, self.replicated)
        # optimizer moments (mu/nu) mirror the param tree: place them with
        # the SAME sharding, or TP would replicate 2x-params of state on
        # every device and relayout it each step. Non-param leaves (step
        # counts etc.) replicate.
        pstruct = jax.tree.structure(self.dit_params)
        is_param_tree = lambda n: jax.tree.structure(n) == pstruct  # noqa

        def place(node):
            if is_param_tree(node):
                return jax.device_put(node, self.param_sharding)
            return jax.tree.map(
                lambda x: jax.device_put(x, self.replicated), node)

        self.opt_state = jax.tree.map(place, self.opt_state,
                                      is_leaf=is_param_tree)

    def _dit_apply(self, params, x, t, actions, valid):
        """DiT forward with params as an explicit (traced) argument — params
        must NEVER be captured as jit closure constants from outside a trace
        (that embeds ~2.7GB of weights into the HLO and stalls compilation).
        config.remat maps to PER-BLOCK rematerialisation (DiTConfig
        .block_remat): the backward stores only block boundaries; a whole-
        forward jax.checkpoint would still stash every scan iteration's
        residuals at once and OOM at flagship size."""
        return dit_apply(
            params, self.dit_cfg, x, t, actions, valid,
            compute_dtype=self.compute_dtype,
        )

    def _dit_fn(self, params):
        """Bind params inside an enclosing trace (params already traced)."""
        return lambda x, t, actions, valid: self._dit_apply(
            params, x, t, actions, valid
        )

    def _build_steps(self):
        cfg = self.config
        accum = cfg.gradient_accumulation_steps

        def loss_for_micro(params, latents, actions, rng):
            mean_loss, sum_loss = diffusion_forcing_loss(
                self._dit_fn(params), latents, actions, rng, self.loss_cfg,
                self.alphas_cumprod, self.noise_range,
            )
            return sum_loss, mean_loss

        grad_fn = jax.value_and_grad(loss_for_micro, has_aux=True)

        def train_step(params, opt_state, vae_params, video, actions, rng,
                       pre_encoded=False):
            # video: (accum, B, T, 3, H, W) pixel micro-batches stacked in
            # front — or (accum, B, T, C, h, w) pre-encoded latents when
            # pre_encoded (LatentCacheDataset; the frozen VAE ran ONCE at
            # cache-build time instead of every step).
            # The frozen VAE encode runs OUTSIDE value_and_grad (the VAE takes
            # no gradient; keeping it out of the grad graph roughly halves
            # the compiled program).
            def micro(carry, inp):
                grads_acc, loss_acc = carry
                v, a, key = inp
                latents = v if pre_encoded else encode_frames(
                    vae_params, self.vae_cfg, v, self.compute_dtype
                )
                (_, mean_loss), grads = grad_fn(params, latents, a, key)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + mean_loss), None

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            keys = jax.random.split(rng, accum)
            if actions is None:
                (grads, loss_sum), _ = jax.lax.scan(
                    lambda c, i: micro(c, (video[i[0]], None, i[1])),
                    (zero_grads, 0.0),
                    (jnp.arange(accum), keys),
                )
            else:
                (grads, loss_sum), _ = jax.lax.scan(
                    lambda c, i: micro(c, (video[i[0]], actions[i[0]], i[1])),
                    (zero_grads, 0.0),
                    (jnp.arange(accum), keys),
                )
            grads = jax.tree.map(lambda g: g / accum, grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "train_loss": loss_sum / accum,
                "grad_norm": optax.global_norm(grads),
            }
            return params, opt_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1),
                                   static_argnames=("pre_encoded",))

        def eval_step(params, vae_params, video, actions, rng,
                      pre_encoded=False):
            latents = video if pre_encoded else encode_frames(
                vae_params, self.vae_cfg, video, self.compute_dtype
            )
            _, mean_loss = loss_for_micro(params, latents, actions, rng)
            return mean_loss

        self._eval_step = jax.jit(eval_step,
                                  static_argnames=("pre_encoded",))

        # rollout for predict(): closure over current params at call time
        self._rollout_cache = {}

    # ----------------------------------------------------------- loops

    def training_loop(self, train_loader, val_loader, callbacks=None):
        """Main loop (reference train(), train_dit.py:851-1035)."""
        cfg = self.config
        callbacks = callbacks or []
        self.train_dataset = getattr(train_loader, "dataset", None)
        if cfg.resume_from_checkpoint:
            self.try_resume()
        self._init_wandb()

        if self.global_step == 0:
            self.run_validation(val_loader)

        step_in_epoch_skip = self.skip_batches if hasattr(self, "skip_batches") else 0
        if hasattr(train_loader, "set_epoch"):
            # replayed epoch must reshuffle with the SAME per-epoch seed the
            # interrupted run used, or skip_batches skips the wrong samples
            train_loader.set_epoch(self.start_epoch)
        prof_until = None
        if cfg.profile_dir:
            # trace a short window of REAL steps (input pipeline included)
            # once the program is compiled: steps 3..13 after (re)start
            prof_until = self.global_step + 13
        for epoch in range(self.start_epoch, cfg.num_epochs):
            for batch in self.iter_device_batches(train_loader):
                if cfg.max_steps > 0 and self.global_step >= cfg.max_steps:
                    self._flush_and_log(epoch, callbacks, always_log=True)
                    logger.info("Reached max_steps=%d", cfg.max_steps)
                    return
                if step_in_epoch_skip > 0:
                    step_in_epoch_skip -= 1
                    continue
                if self.global_step == 0:
                    self._step0_diagnostics(batch)
                if prof_until is not None and self.global_step == prof_until - 10:
                    jax.profiler.start_trace(cfg.profile_dir)
                # train_step returns the metrics of the PREVIOUSLY
                # dispatched step (deferred fetch; see its docstring)
                prev_label = self.global_step
                metrics = self.train_step(batch)
                self.global_step += 1
                if prof_until is not None and self.global_step >= prof_until:
                    jax.profiler.stop_trace()
                    logger.info("wrote profiler trace to %s", cfg.profile_dir)
                    prof_until = None
                if metrics is not None and prev_label % cfg.logging_steps == 0:
                    self.log_metrics(metrics, epoch, step=prev_label)
                want_val = (
                    cfg.validation_steps > 0
                    and self.global_step % cfg.validation_steps == 0
                )
                want_save = (
                    cfg.save_every > 0
                    and self.global_step % cfg.save_every == 0
                )
                if want_val or want_save:
                    # sync the in-flight step so records stay ordered and
                    # the checkpoint state is final
                    self._flush_and_log(epoch, callbacks)
                if want_val:
                    self.run_validation(val_loader)
                if want_save:
                    self.save_model(epoch)
                    self.save_checkpoint(epoch)
                if metrics is not None:
                    for cb in callbacks:
                        cb(self, metrics)
            # epoch boundary: sync so the last step's record lands in-epoch
            self._flush_and_log(epoch, callbacks)
            self.start_epoch = epoch + 1

    def iter_device_batches(self, loader):
        accum = self.config.gradient_accumulation_steps
        B = self.config.batch_size * self.n_devices

        def regroup():
            stack_v, stack_a = [], []
            for b in loader:
                stack_v.append(b.video)
                stack_a.append(b.actions)
                if len(stack_v) == accum:
                    video = np.stack(stack_v)  # (accum, B, T, 3, H, W)
                    actions = (
                        np.stack(stack_a) if stack_a[0] is not None else None
                    )
                    stack_v, stack_a = [], []
                    yield Batch(video=video, actions=actions,
                                is_latents=b.is_latents)

        del B
        from jax.sharding import NamedSharding, PartitionSpec as P

        micro_sharding = NamedSharding(self.mesh, P(None, "data"))
        return device_prefetch(regroup(), sharding=micro_sharding)

    def train_step(self, batch: Batch):
        """Dispatch one jitted train step; return the PREVIOUS dispatched
        step's metrics (None on the first call).

        The fetch is deferred one step so the loop never drains the device
        pipeline: while step N executes, the host fetches step N-1's
        (already materialised) scalars, decodes batch N+1 and dispatches it.
        A synchronous per-step float() fetch instead serialises
        put -> execute -> round-trip every step — measured 0.885 s/step vs
        0.249 s of device self-time on the tunneled v5e (docs/PERF.md
        round-5 training; on direct-attached hosts the gap is the ~ms
        dispatch latency, and the deferral is still free).

        step_time_s is therefore WALL time between dispatches — it includes
        the input pipeline, which is what sustained-throughput accounting
        wants (scripts/train_soak.py)."""
        entry = time.perf_counter()
        # materialize the PREVIOUS step's metrics BEFORE dispatching the new
        # one: the device finished it while this batch was being prepared, so
        # the read costs one round trip. Reading AFTER the dispatch queues
        # the read behind the new execution on serialized transports (the
        # remote tunnel) and re-serializes the loop (measured 680 ms vs
        # 25 ms on the tunneled v5e).
        prev = self._inflight
        out = None if prev is None else self._materialize(prev, entry)
        t_fetch = time.perf_counter()
        self.rng, key = jax.random.split(self.rng)
        t_split = time.perf_counter()
        self.dit_params, self.opt_state, metrics = self._train_step(
            self.dit_params, self.opt_state, self.vae_params, batch.video,
            batch.actions, key, pre_encoded=batch.is_latents,
        )
        t_disp = time.perf_counter()
        self._inflight = (metrics, entry, self.lr_schedule(self.global_step))
        if os.environ.get("GTAX_STEP_TRACE") == "1":
            logger.info(
                "step-trace: fetch=%.1fms split=%.1fms dispatch=%.1fms",
                1e3 * (t_fetch - entry), 1e3 * (t_split - t_fetch),
                1e3 * (t_disp - t_split))
        return out

    def _flush_and_log(self, epoch, callbacks, always_log=False):
        """Flush the in-flight step and deliver its record/callbacks — every
        dispatched step reaches log gating and callbacks exactly once,
        whether through the next iteration's deferred return or a flush."""
        tail = self.flush_metrics()
        if tail is None:
            return None
        if always_log or self.global_step % self.config.logging_steps == 0:
            self.log_metrics(tail, epoch)
        for cb in callbacks or []:
            cb(self, tail)
        return tail

    def train_step_sync(self, batch: Batch):
        """train_step + flush: returns the JUST-dispatched step's metrics
        synchronously (tests / interactive probes; production loops use the
        deferred train_step/flush_metrics pair)."""
        self.train_step(batch)
        return self.flush_metrics()

    def flush_metrics(self):
        """Block on the in-flight step and return its metrics (or None).
        Called before validation/checkpointing so records stay ordered."""
        prev, self._inflight = self._inflight, None
        if prev is None:
            return None
        return self._materialize(prev, time.perf_counter())

    def _materialize(self, inflight, now):
        metrics, entry, lr = inflight
        out = {k: float(v) for k, v in metrics.items()}
        dt = now - entry
        out["step_time_s"] = dt
        out["mfu"] = self.mfu.mfu(dt)
        out["learning_rate"] = float(lr)
        return out

    def _step0_diagnostics(self, batch: Batch):
        """First-step sanity dump (reference train_dit.py:652-674, 686-699):
        per-rank tensor stats of the first training batch plus the in-loss
        visualization grid — the reference's primary "is my data pipeline
        sane" tool. Must never kill training."""
        try:
            rank = jax.process_index()
            for name, arr in (("video", batch.video),
                              ("actions", batch.actions)):
                if arr is None:
                    logger.info("[rank %d] step0 %s: None", rank, name)
                    continue
                if hasattr(arr, "addressable_shards"):
                    # per-rank LOCAL stats (the reference dumps per-rank,
                    # train_dit.py:686-699); also safe on non-fully-
                    # addressable multi-host global arrays
                    a = np.concatenate(
                        [np.asarray(s.data) for s in arr.addressable_shards]
                    ).astype(np.float32)
                else:
                    a = np.asarray(arr).astype(np.float32)
                logger.info(
                    "[rank %d] step0 %s: shape=%s dtype=%s "
                    "min=%.4f max=%.4f mean=%.4f std=%.4f",
                    rank, name, a.shape, getattr(arr, "dtype", "?"),
                    a.min(), a.max(), a.mean(), a.std(),
                )
        except Exception as e:
            logger.warning("step0 tensor-stat dump failed: %r", e)
        if batch.is_latents:
            return  # the grid decodes pixels; latent-cache batches carry none
        try:
            # drop the leading accumulation axis for the single-window grid
            self.predict_noise(
                Batch(video=np.asarray(jax.device_get(batch.video))[0],
                      actions=(
                          np.asarray(jax.device_get(batch.actions))[0]
                          if batch.actions is not None else None
                      ))
            )
        except Exception as e:
            logger.warning("step0 visualization failed: %r", e)

    def _eval_key(self, tag: int):
        """STATELESS eval key: evals must never advance self.rng — they run
        inside per-rank try/except (and their batch counts can differ per
        rank), so splitting the training stream there would silently
        desynchronise the replicated RNG across processes. Derived from
        (seed, global_step, tag) instead."""
        base = jax.random.fold_in(
            jax.random.PRNGKey(self.config.seed ^ 0x5EED), self.global_step
        )
        return jax.random.fold_in(base, tag)

    def run_validation(self, val_loader, max_batches: int | None = None):
        """Validation loss + rollout + renoise evals
        (reference train_dit.py:711-744, 371-464, 466-552).

        Like the reference's validation(), this walks the ENTIRE val loader
        by default; `validation_max_batches` (config) or the `max_batches`
        argument caps it for quick sanity runs (<=0 means no cap)."""
        if val_loader is None:
            return None
        if max_batches is None:
            max_batches = self.config.validation_max_batches
        losses = []
        first_batch = None
        for i, batch in enumerate(self.iter_eval_batches(val_loader)):
            if first_batch is None:
                first_batch = batch
            if max_batches > 0 and i >= max_batches:
                break
            key = self._eval_key(i)
            losses.append(
                float(
                    self._eval_step(
                        self.dit_params, self.vae_params, batch.video,
                        batch.actions, key, pre_encoded=batch.is_latents,
                    )
                )
            )
        avg = sum(losses) / max(1, len(losses))
        if jax.process_count() > 1:
            # cross-process mean — the reference logs main-rank-local val loss
            # (quirk 9, train_dit.py:740); gtax reduces properly
            from jax.experimental import multihost_utils

            avg = float(
                np.mean(multihost_utils.process_allgather(np.float32(avg)))
            )
        logger.info("val_loss=%.5f at step %d", avg, self.global_step)
        self.log_metrics({"val_loss": avg}, epoch=self.start_epoch)
        if first_batch is not None and not first_batch.is_latents:
            # predict/renoise visualise pixels; latent-cache val batches
            # carry none (point the val loader at a pixel dataset for mp4s)
            try:
                self.predict(first_batch)
                self.predict_noise(first_batch)
            except Exception as e:  # evals must never kill training
                logger.warning("predict eval failed: %r", e)
        return avg

    def iter_eval_batches(self, loader):
        return device_prefetch(iter(loader), sharding=None)

    def predict(self, batch: Batch, num_frames: int = 32):
        """Rollout eval writing an mp4 (reference predict, train_dit.py:371-464)."""
        cfg = self.config
        video = jnp.asarray(batch.video[:1, : cfg.n_prompt_frames])
        if cfg.use_action_conditioning and batch.actions is not None:
            from gtax.data.actions import forward_actions

            actions = np.asarray(batch.actions[:1])
            if actions.shape[1] < num_frames:
                fill = forward_actions(1, num_frames - actions.shape[1])
                actions = np.concatenate([actions, fill], axis=1)
            actions = jnp.asarray(actions)
        else:
            actions = None

        latents = encode_frames(
            self.vae_params, self.vae_cfg, video, self.compute_dtype
        )
        if "rollout" not in self._rollout_cache:
            # params flow through as a jit argument, so one compiled rollout
            # serves every future params value
            self._rollout_cache["rollout"] = make_rollout(
                self._dit_apply, self.max_frames, self.sampler_cfg
            )
        rollout = self._rollout_cache["rollout"]
        rkey = self._eval_key(101)
        lat = rollout(self.dit_params, latents, actions, rkey,
                      num_gen_frames=num_frames - latents.shape[1])
        pix = decode_frames(self.vae_params, self.vae_cfg, lat,
                            self.compute_dtype)
        os.makedirs("debug_visualizations", exist_ok=True)
        from gtax.io.video import write_video

        path = (
            f"debug_visualizations/test_{self.config.model_name}"
            f"_{jax.process_index()}_epoch_{self.start_epoch}"
            f"_gs_{self.global_step}.mp4"
        )
        write_video(path, np.asarray(pix[0]), fps=10)
        logger.info("generation saved to %s", path)
        return path

    def predict_noise(self, batch: Batch):
        """Renoise-the-last-frame eval (reference predict_noise,
        train_dit.py:466-552) + debug grid."""
        video = jnp.asarray(batch.video[:1])
        actions = (
            jnp.asarray(batch.actions[:1])
            if (self.config.use_action_conditioning and batch.actions is not None)
            else None
        )
        latents = encode_frames(
            self.vae_params, self.vae_cfg, video, self.compute_dtype
        )
        abar, noise_range = self.sampler_cfg.tables()
        key = self._eval_key(102)
        if "renoise" not in self._rollout_cache:
            self._rollout_cache["renoise"] = jax.jit(
                lambda p, lat, a, k: renoise_last_frame(
                    self._dit_fn(p), lat, a, k, self.sampler_cfg, abar,
                    noise_range,
                )
            )
        out = self._rollout_cache["renoise"](
            self.dit_params, latents, actions, key
        )
        try:
            from gtax.train.viz import visualize_step

            visualize_step(
                x_curr=np.asarray(latents),
                x_noisy=np.asarray(out["x_noisy"]),
                noise=np.asarray(out["noise"]),
                v=np.asarray(out["v"]),
                pred=np.asarray(out["denoised"]),
                step=self.global_step,
                decode_fn=lambda lat: np.asarray(
                    decode_frames(
                        self.vae_params, self.vae_cfg, jnp.asarray(lat),
                        self.compute_dtype,
                    )
                ),
                name=f"{self.config.model_name}_noise_gs_{self.global_step}.png",
            )
        except Exception as e:
            logger.warning("visualization failed: %r", e)
        return out["denoised"]

    # ------------------------------------------------------ checkpointing

    def save_model(self, epoch: int):
        """Weight-only safetensors export (reference save_model,
        train_dit.py:746-763)."""
        if jax.process_count() > 1:
            # collective: every process participates (params may be sharded
            # over 'model' across hosts), then only process 0 writes
            from jax.experimental import multihost_utils

            host_params = multihost_utils.process_allgather(
                self.dit_params, tiled=True
            )
        else:
            host_params = jax.device_get(self.dit_params)
        if jax.process_index() != 0:
            return
        os.makedirs(self.config.output_dir, exist_ok=True)
        path = os.path.join(
            self.config.output_dir,
            f"{self.config.model_name}_epoch_{epoch + 1}_{self.global_step}"
            ".safetensors",
        )
        from gtax.models.dit import restack_params

        port.save_dit(path, restack_params(host_params, self.dit_cfg),
                      self.dit_cfg)
        logger.warning("Saved checkpoint to %s", path)

    def _ckpt_dir(self):
        return os.path.abspath(
            os.path.join(
                self.config.output_dir,
                f"train_checkpoints/{self.config.model_name}_last",
            )
        )

    def save_checkpoint(self, epoch: int):
        """Full train state via orbax (+ step metadata, reference
        save_checkpoint train_dit.py:765-800)."""
        import orbax.checkpoint as ocp

        path = self._ckpt_dir()
        if jax.process_index() == 0:
            os.makedirs(os.path.dirname(path), exist_ok=True)
        # live (possibly host-sharded) jax.Arrays: every process participates
        # in the orbax save, which is the multi-host-correct protocol — never
        # device_get here (each host would race to write the same files)
        state = {
            "params": self.dit_params,
            "opt_state": self.opt_state,
            # rng is identical on every host (same seed, same split sequence);
            # replicate it on the mesh so multi-host orbax sees one sharding
            "rng": jax.device_put(self.rng, self.replicated),
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, f"state_{self.global_step}"), state)
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            # this is the rolling "_last" checkpoint (the reference
            # overwrites one dir in place, train_dit.py:765-800): prune the
            # superseded state_* dirs or a long run fills the disk with
            # full optimizer states
            import shutil

            for name in os.listdir(path):
                if (name.startswith("state_")
                        and name != f"state_{self.global_step}"):
                    shutil.rmtree(os.path.join(path, name),
                                  ignore_errors=True)
            meta = {"step": self.global_step, "epoch": epoch,
                    "time": time.time()}
            # wandb run resumes across restarts (reference train_dit.py:810-830)
            if self.wandb_run_id is not None:
                meta["wandb_run_id"] = self.wandb_run_id
            # resumable stream position for the tar-streaming backend —
            # capability the reference's webdataset path lacks
            # (reference train_dit.py:1051-1053)
            cursor = getattr(getattr(self, "train_dataset", None), "cursor",
                             None)
            if cursor is not None:
                meta["data_cursor"] = list(cursor)
            with open(os.path.join(path, "step.json"), "w") as f:
                json.dump(meta, f)
        logger.warning("Saved checkpoint for step %d", self.global_step)

    def try_resume(self):
        """Restore params/opt/rng/step (reference load_checkpoint,
        train_dit.py:802-849)."""
        import orbax.checkpoint as ocp

        path = self._ckpt_dir()
        meta = os.path.join(path, "step.json")
        if not os.path.exists(meta):
            logger.info("No checkpoint at %s; starting fresh", path)
            return False
        with open(meta) as f:
            state_meta = json.load(f)
        self.global_step = state_meta["step"]
        self.start_epoch = state_meta["epoch"]
        self.wandb_run_id = state_meta.get("wandb_run_id")
        cursor_restored = False
        if "data_cursor" in state_meta and hasattr(self, "train_dataset"):
            if hasattr(self.train_dataset, "cursor"):
                self.train_dataset.cursor = list(state_meta["data_cursor"])
                cursor_restored = True
        ckptr = ocp.StandardCheckpointer()
        # abstract template with the LIVE shardings: each host restores only
        # its shards, directly onto its devices (multi-host correct)
        abstract = lambda x: jax.ShapeDtypeStruct(  # noqa: E731
            x.shape, x.dtype, sharding=x.sharding
        )
        template = {
            "params": jax.tree.map(abstract, self.dit_params),
            "opt_state": jax.tree.map(abstract, self.opt_state),
            "rng": abstract(jax.device_put(self.rng, self.replicated)),
        }
        state = ckptr.restore(
            os.path.join(path, f"state_{self.global_step}"), template
        )
        self.dit_params = state["params"]
        self.opt_state = state["opt_state"]
        self.rng = jnp.asarray(jax.device_get(state["rng"]))
        # fast-forward within the epoch (reference :837-839) — but only for
        # datasets WITHOUT a stream cursor: a restored cursor already
        # positions the stream exactly, and skipping on top of it would
        # discard (and re-download) up to an epoch of data
        self.skip_batches = (
            0 if cursor_restored
            else self.global_step % max(1, self.steps_per_epoch)
        )
        logger.info(
            "Resumed from epoch %d, step %d, skipping %d steps%s",
            self.start_epoch + 1, self.global_step, self.skip_batches,
            " (stream cursor restored)" if cursor_restored else "",
        )
        return True

    # ----------------------------------------------------------- logging

    def _init_wandb(self):
        """wandb init with run resumption (reference train_dit.py:874-879 +
        810-830: the run id from step.json resumes the same wandb run)."""
        if not self.config.use_wandb or jax.process_index() != 0:
            return
        try:
            import wandb
        except ImportError:
            logger.info("wandb unavailable; metrics go to JSONL only")
            return
        if wandb.run is None:
            run = wandb.init(
                project="diffusion-transformer",
                config=self.config.to_dict(),
                id=self.wandb_run_id,
                resume="allow" if self.wandb_run_id else None,
            )
        else:
            run = wandb.run
        self.wandb_run_id = run.id

    def log_metrics(self, metrics: dict, epoch: int, step: int | None = None):
        # wall_time: consecutive-record deltas measure TRUE sustained step
        # time including the input pipeline (step_time_s is the
        # dispatch-to-dispatch wall of the deferred-fetch pipeline) — the
        # number scripts/train_soak.py certifies. `step` labels deferred
        # train records with the step they describe.
        step = self.global_step if step is None else step
        record = {"step": step, "epoch": epoch,
                  "wall_time": round(time.time(), 3), **metrics}
        logger.info(
            "step %d | %s",
            step,
            " ".join(f"{k}={v:.5g}" for k, v in metrics.items()
                     if isinstance(v, (int, float))),
        )
        if self.config.use_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    wandb.log(record)
            except ImportError:
                pass
        # JSONL metrics sink (observability without wandb)
        os.makedirs(self.config.output_dir, exist_ok=True)
        with open(
            os.path.join(self.config.output_dir,
                         f"{self.config.model_name}_metrics.jsonl"), "a"
        ) as f:
            f.write(json.dumps(record) + "\n")


def build_loaders(config: TrainingConfig, **dataset_kw):
    """Dataset/loader wiring (reference main(), train_dit.py:1038-1090).

    Multi-process: each process builds a loader over ONLY its slice of the
    data — map-style datasets via DistributedSampler-style rank/world strides,
    the tar streamer via (process, worker) shard splitting — and yields
    batch_size * local_device_count samples per step. The global batch is
    assembled shard-by-shard in device_prefetch (no process ever materialises
    another host's rows). Reference equivalent: accelerator.prepare(loader)
    per-rank sharding, train_dit.py:854."""
    rank, world = jax.process_index(), jax.process_count()
    if config.dataset_type == "dummy":
        # dummy frames must match the configured VAE's input geometry
        vae_cfg = VAE_MODELS[config.vae_model]()
        dataset_kw.setdefault("height", vae_cfg.input_height)
        dataset_kw.setdefault("width", vae_cfg.input_width)
    elif config.dataset_type == "webdataset":
        # fast host pipeline by default: fused cv2 decode+split+resize to
        # uint8 channel-last (float cast + transpose happen on device,
        # as_float_video) and a decode thread pool sized to the host
        # (scripts/loader_bench.py measures both; the legacy float path is
        # decode-bound at ~0.9x the flagship step's appetite on 1 core)
        dataset_kw.setdefault("pixel_u8", True)
        dataset_kw.setdefault("decode_workers",
                              min(os.cpu_count() or 1, 16))
        vae_cfg = VAE_MODELS[config.vae_model]()
        if (vae_cfg.input_height, vae_cfg.input_width) != (360, 640):
            # non-flagship VAE geometry (debug presets): resize to match
            from gtax.data.common import ClipTransform

            dataset_kw.setdefault("transform", ClipTransform(
                target_h=vae_cfg.input_height,
                target_w=vae_cfg.input_width))
        if world > 1:
            dataset_kw.setdefault("worker_index", rank)
            dataset_kw.setdefault("num_workers", world)
    # a custom 'shards' list must not leak into the validation split (val
    # would silently evaluate on the training shards); val_shards=/val_size=
    # point validation at its own data
    split_only = ("shards", "size", "val_shards", "val_size")
    val_kw = {k: v for k, v in dataset_kw.items() if k not in split_only}
    if config.dataset_type == "webdataset":
        # validation must be ONE deterministic pass: the streaming dataset
        # defaults to resampled=True + a 1000-sample shuffle buffer (training
        # ergonomics), but run_validation walks the WHOLE val loader
        # (reference train_dit.py:711-744) — an infinite resampled iterator
        # would hang it at step 0, and the buffer would delay the first val
        # batch by 1000 decodes
        val_kw.setdefault("resampled", False)
        val_kw.setdefault("shuffle_shards", False)
        val_kw.setdefault("shuffle_buffer", 1)
    if "val_shards" in dataset_kw:
        val_kw["shards"] = dataset_kw.pop("val_shards")
    if "val_size" in dataset_kw:
        val_kw["size"] = dataset_kw.pop("val_size")
    if "shards" in dataset_kw and "shards" not in val_kw:
        logger.warning(
            "custom train shards without val_shards: validation falls back "
            "to the registry 'validation' split")
    train_ds = make_dataset(
        config.dataset_type, "train", config.use_action_conditioning,
        **dataset_kw,
    )
    val_ds = make_dataset(
        config.dataset_type, "validation", config.use_action_conditioning,
        **val_kw,
    )
    n_local = jax.local_device_count()
    train_loader = DataLoader(
        train_ds, batch_size=config.batch_size * n_local,
        num_workers=min(os.cpu_count() or 1, 32), seed=config.seed,
        rank=rank, world=world,
    )
    val_loader = DataLoader(
        val_ds, batch_size=config.validation_batch_size,
        num_workers=min(os.cpu_count() or 1, 8), seed=config.seed,
        shuffle=False, rank=rank, world=world,
    )
    return train_loader, val_loader
