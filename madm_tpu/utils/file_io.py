"""Checkpoint-URL resolution (reference: ``utils/file_io.py`` iopath handlers).

The reference registers iopath PathHandlers for ``odise://`` (released MADM/
ODISE checkpoints) and ``sd://`` (Stable Diffusion weights) with a local-zoo
override.  Without egress the catalog resolves exclusively through local
directories: set ``MADM_MODEL_ZOO`` (checkpoints) and ``MADM_SD_ZOO``
(SD snapshots); ``resolve_path`` maps prefixed URLs to files beneath them.
"""

from __future__ import annotations

import os

PREFIXES = {
    "odise://": ("MADM_MODEL_ZOO", "~/.cache/madm_tpu/models"),
    "sd://": ("MADM_SD_ZOO", "~/.cache/madm_tpu/sd"),
}


def resolve_path(path: str) -> str:
    """Map ``odise://name`` / ``sd://name`` to a local file; passthrough
    otherwise.  Raises FileNotFoundError with the expected location when the
    local zoo does not contain the artifact (zero-egress environment)."""
    for prefix, (env, default) in PREFIXES.items():
        if path.startswith(prefix):
            root = os.path.expanduser(os.environ.get(env, default))
            local = os.path.join(root, path[len(prefix):])
            if not os.path.exists(local):
                raise FileNotFoundError(
                    f"{path}: place the artifact at {local} (no network egress; "
                    f"set ${env} to change the zoo root)"
                )
            return local
    return os.path.expanduser(path)
