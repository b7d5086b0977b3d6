"""Checkpointing with reference ``.pth`` format parity.

Mirrors the reference ``Checkpointer``/``CheckpointerV2``
(``mopa/common/utils/checkpoint.py:12-179``): checkpoints are ``<name>.pth``
files holding ``{'model': state_dict, 'optimizer': ..., 'scheduler': ...,
'iteration': int, ...}``; a ``last_checkpoint<postfix>`` pointer file enables
AUTO_RESUME; V2 keeps a ``max_to_keep`` ring buffer deleting the oldest file.

Serialization uses ``torch.save``/``torch.load`` (CPU-only torch is in the
image) so released reference checkpoints load directly and our checkpoints
remain readable by the reference. Model/optimizer states cross the
JAX<->torch boundary as flat ``name -> numpy array`` dicts; the name mapping
to flax pytrees lives in ``mopa_tpu.models.torch_compat``.
"""

import logging
import os

import numpy as np

from mopa_tpu.common.io_utils import get_md5

try:
    import torch
except ImportError:  # pragma: no cover - torch is baked into the image
    torch = None


def _to_numpy_tree(obj):
    """Recursively convert torch tensors / JAX arrays to numpy."""
    if torch is not None and isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if hasattr(obj, "__array__") and not isinstance(obj, np.ndarray):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy_tree(v) for v in obj)
    return obj


class Checkpointer(object):
    """Save/load checkpoints with a `last_checkpoint` pointer file."""

    _last_checkpoint_name = "last_checkpoint"

    def __init__(self, state_provider=None, save_dir="", logger=None, postfix=""):
        """
        Args:
            state_provider: object with ``state_dict() -> dict`` and
                ``load_state_dict(dict, resume_states: bool)`` (our TrainState
                adapters implement this; see ``mopa_tpu.train.trainer``).
        """
        self.state_provider = state_provider
        self.save_dir = save_dir
        self.logger = logger or logging.getLogger(__name__)
        self.postfix = postfix

    # -- core ------------------------------------------------------------------
    def save(self, name, tag=True, **kwargs):
        if not self.save_dir:
            return None
        data = {}
        if self.state_provider is not None:
            data.update(_to_numpy_tree(self.state_provider.state_dict()))
        data.update(kwargs)
        save_file = os.path.join(self.save_dir, "{}.pth".format(name))
        self.logger.info("Saving checkpoint to {}".format(save_file))
        if torch is not None:
            torch.save(data, save_file)
        else:
            np.save(save_file, data, allow_pickle=True)
        if tag:
            self.tag_last_checkpoint(save_file)
        return save_file

    def load(self, path=None, resume=True, resume_states=True):
        if resume and self.has_checkpoint():
            path = self.get_checkpoint_file()
        if not path:
            self.logger.info("No checkpoint found. Initializing model from scratch")
            return {}
        self.logger.info("Loading checkpoint from {}, MD5: {}".format(path, get_md5(path)))
        checkpoint = self._load_file(path)
        if self.state_provider is not None:
            checkpoint = self.state_provider.load_state_dict(
                checkpoint, resume_states=resume_states
            )
        return checkpoint

    def _load_file(self, path):
        if torch is not None:
            data = torch.load(path, map_location="cpu", weights_only=False)
        else:
            data = np.load(path, allow_pickle=True).item()
        return _to_numpy_tree(data)

    # -- pointer file ----------------------------------------------------------
    def has_checkpoint(self):
        return os.path.exists(self._pointer_path())

    def get_checkpoint_file(self):
        try:
            with open(self._pointer_path(), "r") as f:
                last_saved = f.read().strip()
        except IOError:
            # pointer file deleted concurrently (reference checkpoint.py:103-106)
            last_saved = ""
        if last_saved and not os.path.isabs(last_saved):
            last_saved = os.path.join(self.save_dir, last_saved)
        return last_saved

    def tag_last_checkpoint(self, last_filename):
        with open(self._pointer_path(), "w") as f:
            f.write(os.path.basename(last_filename))

    def _pointer_path(self):
        return os.path.join(self.save_dir, self._last_checkpoint_name + self.postfix)


class CheckpointerV2(Checkpointer):
    """Adds a max_to_keep ring buffer (reference checkpoint.py:121-179)."""

    def __init__(self, state_provider=None, save_dir="", logger=None, postfix="",
                 max_to_keep=5, **_compat_kwargs):
        super().__init__(state_provider, save_dir, logger, postfix)
        self.max_to_keep = max_to_keep
        self._last_checkpoints = []
        self._restore_ring()

    def _ring_path(self):
        return os.path.join(self.save_dir, "checkpoint_ring" + self.postfix)

    def _restore_ring(self):
        try:
            with open(self._ring_path(), "r") as f:
                self._last_checkpoints = [ln.strip() for ln in f if ln.strip()]
        except IOError:
            self._last_checkpoints = []

    def _persist_ring(self):
        with open(self._ring_path(), "w") as f:
            f.write("\n".join(self._last_checkpoints))

    def save(self, name, tag=True, **kwargs):
        save_file = super().save(name, tag=tag, **kwargs)
        if save_file is None or not tag:
            return save_file
        if save_file in self._last_checkpoints:
            self._last_checkpoints.remove(save_file)
        self._last_checkpoints.append(save_file)
        while self.max_to_keep > 0 and len(self._last_checkpoints) > self.max_to_keep:
            victim = self._last_checkpoints.pop(0)
            try:
                os.remove(victim)
            except OSError:
                pass
        self._persist_ring()
        return save_file
