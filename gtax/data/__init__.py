from gtax.data.actions import actions_to_one_hot  # noqa: F401
from gtax.data.common import ClipTransform, split_len  # noqa: F401
from gtax.data.dummy import DummyDataset  # noqa: F401
from gtax.data.loader import Batch, DataLoader, make_dataset  # noqa: F401
