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
import logging

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
        import glob
        import os

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

    train_loader, val_loader = build_loaders(config, **dataset_kw)
    trainer = Trainer(config, total_dataset_size=len(train_loader.dataset))

    # wandb init happens inside training_loop (after resume, so the run id
    # from step.json resumes the same wandb run — reference train_dit.py:810-830)
    trainer.training_loop(train_loader, val_loader)


if __name__ == "__main__":
    main()
