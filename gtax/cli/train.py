"""Training CLI.

Parity target: /root/reference/train_dit.py main() (:1038-1094) — YAML config
in, dataset selection, trainer, loop. Reference YAML configs (configs/
train_dit.yaml, train_dit_actions.yaml) load unchanged.

Usage:  python -m gtax.cli.train configs/train_dit.yaml
Multi-host TPU: run one process per host; jax.distributed is initialised from
the standard TPU environment automatically when available.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

from gtax.utils.platform import enable_compile_cache, honor_env_platform

honor_env_platform()  # must precede any jax device use
enable_compile_cache()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Path to config YAML file")
    parser.add_argument("--dataset_root", type=str, default=None,
                        help="local shard dir for the webdataset backend")
    parser.add_argument("--dummy_size", type=int, default=None,
                        help="override the dummy dataset length (smoke runs)")
    parser.add_argument("--dataset_size", type=int, default=None,
                        help="true sample count of --dataset_root shards "
                             "(sets the LR schedule's steps/epoch and the "
                             "latent-cache build size; without it the tar "
                             "streamer estimates ~1000/shard)")
    parser.add_argument("--latent_cache", type=str, default=None,
                        help="directory of precomputed VAE latents for the "
                             "TRAIN split (gtax.data.latents). Built on "
                             "first use from the configured dataset; later "
                             "runs train straight from the cache — the "
                             "frozen VAE encode leaves the step entirely "
                             "(bit-identical losses, tested). Validation "
                             "stays on the pixel dataset so mp4/grid evals "
                             "keep working.")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    # multi-host init MUST run before any other jax use (no-op when
    # single-process; env/TPU-pod autodetect in gtax.parallel.mesh)
    from gtax.parallel.mesh import initialize_distributed

    initialize_distributed()

    from gtax.train.config import TrainingConfig

    config = TrainingConfig.from_yaml(args.config)

    if config.dataset_type == "webdataset":
        logging.info(
            "Using the streaming tar backend (memory-efficient; shard cursor "
            "is checkpointed for resume, unlike the reference)."
        )
    elif config.dataset_type == "hfdataset":
        logging.info("Using HFDataset (loads into memory; needs RAM).")
    elif config.dataset_type == "dummy":
        logging.info("Using dummy dataset for testing purposes.")

    from gtax.train.trainer import Trainer, build_loaders

    dataset_kw = {}
    if args.dataset_root and config.dataset_type == "webdataset":
        dataset_kw["shards"] = sorted(
            glob.glob(os.path.join(args.dataset_root, "*.tar"))
        )
        # validation shards: <root>/{val,dev,validation}/*.tar if present;
        # otherwise reuse the training shards (explicitly — val loss then
        # measures trained-on data) rather than hitting the HF hub
        for sub in ("val", "dev", "validation"):
            vs = sorted(
                glob.glob(os.path.join(args.dataset_root, sub, "*.tar")))
            if vs:
                dataset_kw["val_shards"] = vs
                break
        else:
            logging.warning(
                "--dataset_root has no val/dev/validation subdir: "
                "validation will stream the TRAINING shards")
            dataset_kw["val_shards"] = dataset_kw["shards"]
    if args.dummy_size is not None and config.dataset_type == "dummy":
        dataset_kw["size"] = args.dummy_size
    if args.dataset_size is not None and config.dataset_type == "webdataset":
        dataset_kw["size"] = args.dataset_size

    train_loader, val_loader = build_loaders(config, **dataset_kw)
    trainer = Trainer(config, total_dataset_size=len(train_loader.dataset))

    if args.latent_cache:
        import jax

        from gtax.data.latents import LatentCacheDataset
        from gtax.data.loader import DataLoader

        if not os.path.exists(os.path.join(args.latent_cache, "meta.json")):
            assert jax.process_count() == 1, (
                "--latent_cache: build the cache single-process first "
                "(multi-host runs read a prebuilt cache)")
            logging.info("Building latent cache at %s ...", args.latent_cache)
            lat_ds = LatentCacheDataset.build(
                train_loader.dataset, trainer.vae_params, trainer.vae_cfg,
                args.latent_cache, compute_dtype=trainer.compute_dtype)
        else:
            lat_ds = LatentCacheDataset(args.latent_cache)
        train_loader = DataLoader(
            lat_ds, batch_size=train_loader.batch_size,
            num_workers=train_loader.num_workers, seed=config.seed,
            rank=train_loader.rank, world=train_loader.world)

    # wandb init happens inside training_loop (after resume, so the run id
    # from step.json resumes the same wandb run — reference train_dit.py:810-830)
    trainer.training_loop(train_loader, val_loader)


if __name__ == "__main__":
    main()
