"""HuggingFace-datasets map-style backend.

Parity target: /root/reference/hf_dataset.py — load_dataset
("Iker/GTAV-Driving-Dataset"), samples carry a 270x2400 strip under "jpg" and
actions under json.actions_int. Requires network; import is gated so offline
environments can still use dummy/webtar backends.
"""

from __future__ import annotations

import numpy as np

from gtax.data.actions import actions_to_one_hot
from gtax.data.common import ClipTransform


class HFDataset:
    def __init__(
        self,
        split: str = "train",
        return_actions: bool = False,
        repo: str = "Iker/GTAV-Driving-Dataset",
        transform: ClipTransform | None = None,
    ):
        from datasets import load_dataset

        self.dataset = load_dataset(repo, split=split)
        self.return_actions = return_actions
        self.transform = transform or ClipTransform()

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        sample = self.dataset[idx]
        img = sample["jpg"]
        if not isinstance(img, np.ndarray):
            img = np.asarray(img)  # PIL -> uint8 HWC
        item = {"video": self.transform(img)}
        if self.return_actions:
            item["actions"] = actions_to_one_hot(sample["json"]["actions_int"])
        return item

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
