"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Usage: python tests/_mh_worker.py <process_id> <num_processes> <port> <tmpdir>

Each worker owns 2 virtual CPU devices (4 global), joins a jax.distributed
cluster, builds its per-process loader slice, runs 2 global DP train steps,
and saves a multi-host orbax checkpoint + safetensors export. The parent
asserts both ranks report the SAME loss (global batch math) and that the
checkpoint artifacts exist exactly once.
"""

import os
import sys


def main():
    pid, nproc, port, tmp = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["GTAX_COORDINATOR"] = f"localhost:{port}"
    os.environ["GTAX_NUM_PROCESSES"] = str(nproc)
    os.environ["GTAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from gtax.parallel.mesh import initialize_distributed

    initialize_distributed()  # env-driven mode
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.devices()
    assert jax.local_device_count() == 2

    from gtax.train.config import TrainingConfig
    from gtax.train.trainer import Trainer, build_loaders

    config = TrainingConfig.from_dict(dict(
        dataset_type="dummy", dit_model="DiT-debug", vae_model="vae-debug",
        vae_checkpoint="", batch_size=1, validation_batch_size=1,
        num_epochs=1, max_steps=2, gradient_accumulation_steps=1,
        ddim_noise_steps=4, ddim_noise_steps_inference=2, ctx_max_noise_idx=2,
        n_prompt_frames=4, use_wandb=False, use_action_conditioning=True,
        learning_rate=1e-3, weight_decay=0.0, output_dir=os.path.join(tmp, "out"),
        compute_dtype="float32", validation_steps=0, save_every=2,
        logging_steps=1, resume_from_checkpoint=False, seed=0,
    ))
    train_loader, _ = build_loaders(config, size=16)
    assert train_loader.rank == pid and train_loader.world == nproc
    trainer = Trainer(config, total_dataset_size=16)

    losses = []
    cb = lambda tr, m: losses.append(m["train_loss"])  # noqa: E731
    trainer.training_loop(train_loader, val_loader=None, callbacks=[cb])
    assert trainer.global_step == 2, trainer.global_step

    # resume path: a fresh trainer restores the multi-host checkpoint
    config.resume_from_checkpoint = True
    trainer2 = Trainer(config, total_dataset_size=16)
    assert trainer2.try_resume(), "resume failed"
    assert trainer2.global_step == 2
    import numpy as np

    for a, b in zip(jax.tree.leaves(trainer.dit_params),
                    jax.tree.leaves(trainer2.dit_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the rank-0 export gate, observable per rank: give each process a
    # PRIVATE output dir (the shared-dir check in the parent cannot tell
    # "rank 0 wrote once" from "every rank wrote the same filename")
    trainer.config.output_dir = os.path.join(tmp, f"export_rank{pid}")
    trainer.save_model(epoch=0)  # collective: every rank participates
    got = ([f for f in os.listdir(trainer.config.output_dir)
            if f.endswith(".safetensors")]
           if os.path.isdir(trainer.config.output_dir) else [])
    assert len(got) == (1 if pid == 0 else 0), (pid, got)

    print(f"RANK {pid} LOSSES {losses[0]:.10f} {losses[1]:.10f}", flush=True)


if __name__ == "__main__":
    main()
