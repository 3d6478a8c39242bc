"""superc / nonsu2 joint-sector solve (placeholder for the build-out in this
round; filled by the superc milestone)."""
from __future__ import annotations


def solve_impurity_joint(cfg, hloc, um, bath, neigen_override=None):
    raise NotImplementedError(
        f"ed_mode={cfg.ed_mode} joint-sector solver lands with the superc/"
        "nonsu2 milestone")
