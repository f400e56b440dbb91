"""Device mesh and sharding rules.

The reference's only parallelism is DDP data-parallel over NCCL via
HF Accelerate (/root/reference/train_dit.py:182-188; gradient all-reduce
implicit in accelerator.backward at :680). The TPU-native equivalent is a
`jax.sharding.Mesh` with jit-partitioned train steps: the batch is sharded
over the 'data' axis, parameters are replicated (or sharded over 'model' for
tensor parallelism), and XLA inserts the psum/all-gather collectives over ICI.

Axes:
  data  — batch sharding (DP). Gradients are reduced over this axis by XLA.
  model — optional tensor parallelism: qkv/MLP hidden dims of the stacked DiT
          blocks are sharded over it. Not needed at 0.6B params on one slice,
          but the mesh is designed so scaling up is a config change, not a
          rewrite (SURVEY.md §2.2).

Multi-host: `initialize_distributed()` wraps jax.distributed.initialize; each
process feeds only its local shard of the global batch
(`process_batch_slice`).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        assert data * model == n_devices, (
            f"mesh {data}x{model} != {n_devices} devices"
        )
        return data, model


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig()
    data, model = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _dit_param_spec(path: tuple[str, ...], ndim: int) -> P:
    """Tensor-parallel sharding rules for DiT params.

    Stacked block kernels are (L, in, out): shard the sliced dimension over
    'model' — qkv/fc1/adaln on the output dim, out/fc2 on the input dim, so a
    block needs exactly one reduce-scatter-equivalent psum per pair. The
    UNSTACKED serving layout (unstack_for_inference: per-block (in, out)
    kernels / (out,) biases) shards the same dimensions one rank lower —
    GSPMD then partitions the jitted rollout over 'model' with no code
    change (multi-chip serving; use the xla attention backend, the Pallas
    megakernels are single-chip).
    """
    names = set(path)
    if "blocks" not in names:
        return P()
    col = {"qkv", "fc1", "s_adaln", "t_adaln", "adaln"}
    row = {"out", "fc2"}
    if "kernel" in names:
        if ndim == 3:
            if names & col:
                return P(None, None, "model")
            if names & row:
                return P(None, "model", None)
        if ndim == 2:
            if names & col:
                return P(None, "model")
            if names & row:
                return P("model", None)
    if "bias" in names and names & col:
        if ndim == 2:
            return P(None, "model")
        if ndim == 1:
            return P("model")
    return P()


def param_sharding(mesh: Mesh, params, rules=_dit_param_spec):
    """NamedSharding pytree for a param tree. With mesh model=1 everything is
    effectively replicated; with model>1 the DiT block interiors shard."""

    def spec_for(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = rules(keys, leaf.ndim)
        if mesh.shape["model"] == 1:
            # avoid uneven-shard pitfalls when TP is off
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host init. Three modes:

    - explicit args (tests, manual clusters);
    - env-driven: GTAX_COORDINATOR / GTAX_NUM_PROCESSES / GTAX_PROCESS_ID
      (the launch scripts export these per host);
    - TPU-pod auto-detect: when the standard TPU runtime env is present,
      jax.distributed.initialize() discovers the topology itself.

    No-op when running single-process. Reference equivalent: Accelerate's
    process-group init at /root/reference/train_dit.py:182-188.
    """
    import os

    if num_processes is None:
        env_n = os.environ.get("GTAX_NUM_PROCESSES")
        if env_n is not None:
            num_processes = int(env_n)
            coordinator_address = os.environ.get("GTAX_COORDINATOR")
            process_id = int(os.environ["GTAX_PROCESS_ID"])
        elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or len(
            [h for h in
             os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        ) > 1:
            # TPU pod: auto-discovered. A SINGLE hostname is not a pod —
            # some single-chip runtimes (e.g. the tunnelled dev plugin)
            # export TPU_WORKER_HOSTNAMES=localhost, and a bare
            # jax.distributed.initialize() would then demand a coordinator
            jax.distributed.initialize()
            return
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_batch_slice(global_batch: int) -> slice:
    """The half-open range of the global batch owned by this host process."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(sharding: NamedSharding, local: np.ndarray):
    """Assemble a global sharded array from this process's slice of the batch.

    Single-process: a plain device_put. Multi-process: each host transfers
    only its local rows; the result is one global jax.Array laid out per
    `sharding` with no cross-host data movement (the TPU-native equivalent of
    DDP per-rank loaders, reference train_dit.py:854)."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def data_parallel_rollout(rollout, mesh: Mesh, num_gen_frames: int):
    """Multi-chip BATCHED serving: shard_map the rollout over the mesh's
    'data' axis (params replicated, prompt/actions batch-sharded).

    GSPMD cannot partition a Pallas custom call, so the int8/fused serving
    kernels are single-chip under plain jit; wrapping the whole rollout in
    shard_map instead runs one shape-complete rollout per device over its
    batch slice — N chips give ~N x aggregate frames/sec with the fastest
    single-chip path unchanged (throughput mode; latency-TP stays on the
    xla backend via `--mesh_model`). Each shard folds its data-axis index
    into the rollout key so streams draw independent noise.

    Returns wrapped(params, prompt_latents, actions, rng) — num_gen_frames
    is bound statically here. The reference has no serving parallelism at
    all (generate.py is strictly single-GPU).
    """
    from jax import shard_map

    data = mesh.shape["data"]

    def body(params, prompt, actions, rng):
        key = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return rollout(params, prompt, actions, key,
                       num_gen_frames=num_gen_frames)

    sharded = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,  # rollout body is opaque (pallas custom calls)
    ))

    def prepare(params, prompt_latents, actions, rng):
        """Device-put the call's inputs with the mesh shardings; returns
        the exact argument tuple `wrapped.sharded` takes (the AOT cache
        lowers/serializes `sharded` against these, gtax.serving)."""
        B = prompt_latents.shape[0]
        assert B % data == 0, (
            f"batch {B} must divide over the {data}-way 'data' mesh axis")
        params = jax.device_put(params, replicated(mesh))
        # multi-host meshes: each process contributes only its local rows of
        # the (host-identical) global batch; single-host is a plain put
        spec = batch_sharding(mesh)
        if jax.process_count() > 1:
            sl = process_batch_slice(B)
            put = lambda a: jax.make_array_from_process_local_data(  # noqa
                spec, np.asarray(a)[sl])
        else:
            put = lambda a: jax.device_put(a, spec)  # noqa: E731
        prompt_latents = put(prompt_latents)
        if actions is not None:
            actions = put(actions)
        return params, prompt_latents, actions, rng

    def wrapped(params, prompt_latents, actions, rng):
        return sharded(*prepare(params, prompt_latents, actions, rng))

    wrapped.sharded = sharded
    wrapped.prepare = prepare
    return wrapped
