"""Export a training checkpoint to reference-format safetensors.

The trainer already exports weights on its save schedule (save_model,
reference train_dit.py:746-763); this CLI converts an existing orbax
train-state directory WITHOUT resuming training — ship weights from any
checkpoint after the fact. The output loads in the reference code
(generate.py:28-47) and in gtax (safetensors_port.load_dit).

Usage:
  python -m gtax.cli.export <ckpt_dir> --out dit.safetensors \
      [--dit_model DiT-S/2] [--step N]

<ckpt_dir> is either a `<output_dir>/train_checkpoints/<name>_last`
directory (step.json selects the step; --step overrides) or a direct
`state_<N>` directory.
"""

from __future__ import annotations

import argparse
import json
import os

from gtax.utils.platform import honor_env_platform

honor_env_platform()  # must precede any jax device use


def resolve_state_dir(path: str, step: int | None) -> str:
    path = os.path.abspath(path)
    if os.path.basename(path).startswith("state_"):
        return path
    if step is None:
        meta = os.path.join(path, "step.json")
        assert os.path.exists(meta), (
            f"{path} has no step.json; pass a state_<N> dir or --step")
        with open(meta) as f:
            step = json.load(f)["step"]
    state_dir = os.path.join(path, f"state_{step}")
    assert os.path.isdir(state_dir), f"missing {state_dir}"
    return state_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("ckpt_dir", help="train_checkpoints/<name>_last dir or a "
                                    "state_<N> dir")
    p.add_argument("--out", required=True, help="output .safetensors path")
    p.add_argument("--dit_model", default="DiT-S/2",
                   help="model preset the checkpoint was trained with")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: step.json)")
    args = p.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    from gtax.io import safetensors_port as port
    from gtax.models.dit import DiT_MODELS

    state_dir = resolve_state_dir(args.ckpt_dir, args.step)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(state_dir)  # raw pytree (no template needed)
    params = state["params"]
    cfg = DiT_MODELS[args.dit_model]()
    # unstack_train checkpoints hold per-block pytrees (a list after orbax
    # restore); dit_to_torch restacks internally
    port.save_dit(args.out, params, cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"exported {n / 1e6:.1f}M params from {state_dir} to {args.out}")
    return args.out


if __name__ == "__main__":
    main()
