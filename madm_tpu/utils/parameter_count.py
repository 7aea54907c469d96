"""Parameter counting tables (reference: ``utils/parameter_count.py:7-120``).

The reference logs a trainable-parameter table at trainer init
(``engine/train_loop.py:70-75``) so what-is-trainable is visible in every run
log.  Here the units are pytree subtrees instead of nn.Modules.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _count(tree: Any) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def _fmt(n: int) -> str:
    if n >= 1e9:
        return f"{n / 1e9:.2f}G"
    if n >= 1e6:
        return f"{n / 1e6:.2f}M"
    if n >= 1e3:
        return f"{n / 1e3:.2f}K"
    return str(n)


def parameter_count_table(
    params: Dict[str, Any],
    trainable_keys=("unet", "lora", "prompt", "projections", "head", "head_sec"),
    max_depth: int = 2,
) -> str:
    """Readable per-subtree parameter counts with a trainable marker."""
    rows: List[Tuple[str, int, bool]] = []

    def walk(node, path, depth):
        if not isinstance(node, dict) or depth == max_depth:
            rows.append((path, _count(node), path.split("/")[0] in trainable_keys))
            return
        for k in sorted(node.keys()):
            walk(node[k], f"{path}/{k}" if path else k, depth + 1)

    walk(params, "", 0)
    total = _count(params)
    trainable = sum(n for _, n, t in rows if t)
    lines = [f"{'module':<48} {'#params':>10}  trainable"]
    lines += [f"{p:<48} {_fmt(n):>10}  {'yes' if t else 'no'}" for p, n, t in rows if n]
    lines.append(f"{'TOTAL':<48} {_fmt(total):>10}  ({_fmt(trainable)} trainable)")
    return "\n".join(lines)
