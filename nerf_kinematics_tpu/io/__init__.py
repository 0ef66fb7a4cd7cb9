"""Persistence: orbax checkpoints, legacy torch-checkpoint compat, snapshots."""

from .checkpoint import CheckpointManager
from .torch_compat import (
    export_legacy_checkpoint,
    import_legacy_checkpoint,
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from .snapshot import save_snapshot, load_snapshot

__all__ = [
    "CheckpointManager",
    "export_legacy_checkpoint",
    "import_legacy_checkpoint",
    "flax_to_torch_state_dict",
    "torch_state_dict_to_flax",
    "save_snapshot",
    "load_snapshot",
]
