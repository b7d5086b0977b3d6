"""Checkpoint name-mapping utilities: flax pytrees <-> flat torch-style dicts.

Checkpoints are stored as flat ``name -> numpy array`` dicts inside ``.pth``
files (reference checkpoint format, ``mopa/common/utils/checkpoint.py:39-58``),
so tooling that reads the reference's checkpoints keeps working.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def flatten_pytree(tree, prefix=""):
    """Flatten a pytree into {'a.b.c': np.ndarray}."""
    out = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, path + (str(k),))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(v, path + (str(i),))
        elif node is None:
            pass
        elif hasattr(node, "_fields"):  # NamedTuple (optax states)
            for k in node._fields:
                visit(getattr(node, k), path + (k,))
        else:
            out[".".join(path)] = np.asarray(node)

    visit(tree, tuple(prefix.split(".")) if prefix else tuple())
    return out


def unflatten_into(template, flat):
    """Rebuild a pytree shaped like ``template`` from a flat name dict.

    Missing keys keep the template's value; shape mismatches raise.
    """
    leaves = dict(flat)

    def visit(node, path):
        if isinstance(node, dict):
            return {k: visit(v, path + (str(k),)) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[visit(getattr(node, k), path + (k,))
                                for k in node._fields])
        if isinstance(node, (list, tuple)):
            return type(node)(visit(v, path + (str(i),))
                              for i, v in enumerate(node))
        if node is None:
            return None
        key = ".".join(path)
        if key in leaves:
            val = np.asarray(leaves[key])
            if hasattr(node, "shape") and tuple(val.shape) != tuple(node.shape):
                raise ValueError(
                    "shape mismatch for {}: ckpt {} vs model {}".format(
                        key, val.shape, node.shape))
            return jnp.asarray(val, dtype=getattr(node, "dtype", None))
        return node

    return visit(template, tuple())
